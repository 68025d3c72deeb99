package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-telemetry anomaly detection: the monitoring pass a 100 TB
  * pipeline runs over its own daily ingest series — "did yesterday's
  * crawl volume spike or collapse" — as a rolling z-score over the
  * gap-filled calendar, with the anomaly verdict computed in EXACT
  * integer/decimal arithmetic so a boundary day cannot flip between
  * engines on a floating-point ulp.
  */
object AnomalyOps {

  /** Rolling z-score flags over the daily value series of `df`.
    *
    * Each day's baseline is the `windowDays` TRAILING days (current day
    * excluded — today must not drag its own baseline toward itself);
    * day x with trailing sum s and sum-of-squares s2 over n = windowDays
    * days is anomalous iff
    *
    *   |x - s/n| > z * sqrt((n*s2 - s*s) / n^2)
    *
    * cross-multiplied to the equivalent integer form
    *
    *   (n*x - s)^2 > z2 * (n*s2 - s*s)        (z2 = z squared)
    *
    * evaluated in DECIMAL(38,0) over the ×10^6 scaled-integer daily
    * totals — both sides exact, no sqrt, no division, no double
    * anywhere near the comparison (the DuckDB mirror uses HUGEINT; both
    * engines agree bit-for-bit). n*s2 - s*s >= 0 by Cauchy-Schwarz, so
    * no negative-variance clamp is needed. Days whose trailing frame is
    * still short (the first `windowDays` days) report 0 — no verdict
    * without a full baseline.
    *
    * Exactness bound: DECIMAL(38,0) holds (n·x − s)² only while the
    * scaled daily totals stay below ~10^18 (38 digits / 2, minus the
    * windowDays factor). Beyond that Spark's non-ANSI decimal arithmetic
    * returns NULL — which must NOT silently read as "not anomalous", so
    * an overflowed comparison raises loudly instead (DuckDB's HUGEINT
    * mirror would keep computing; silent disagreement is the one thing
    * this op promises not to do).
    *
    * Scale shape: the distributed work is [[ResampleOps.resampleAgg]]'s
    * daily aggregate; the window then runs over the gap-filled CALENDAR
    * (rows = days in span, metadata-sized), so the deliberately global
    * single-task window never sees the fact table. */
  def anomalyDaily(
      df: DataFrame, tsCol: String, valueCol: String,
      windowDays: Int, z2: Int): DataFrame = {
    require(windowDays >= 2, s"need a multi-day baseline: $windowDays")
    require(z2 >= 1, s"z2 must be positive: $z2")
    val daily = ResampleOps.resampleAgg(df, tsCol, ResampleOps.Daily, Seq(
      (sum((col(valueCol).cast("decimal(18,6)") * 1000000).cast("long")),
        "total_e6", lit(0L))))
    val w = Window.orderBy(col("bucket")).rowsBetween(-windowDays, -1)
    val x = col("total_e6").cast("decimal(38,0)")
    val n = col("win_n").cast("decimal(38,0)")
    val s = col("__s")
    val s2 = col("__s2")
    val lhs = (n * x - s) * (n * x - s)
    val rhs = lit(z2).cast("decimal(38,0)") * (n * s2 - s * s)
    daily
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("__s", sum(x).over(w))
      .withColumn("__s2", sum(x * x).over(w))
      .withColumn("baseline_sum_e6",
        coalesce(col("__s").cast("long"), lit(0L)))
      .withColumn("is_anomaly",
        when(col("win_n") =!= windowDays.toLong, 0L)
          .when(lhs.isNull || rhs.isNull,
            raise_error(lit("anomalyDaily: DECIMAL(38,0) overflow — scaled " +
              "daily totals exceed the ~1e18 exactness bound; rescale the " +
              "value column")).cast("long"))
          .when(lhs > rhs, 1L)
          .otherwise(0L))
      .select(col("bucket"), col("total_e6"), col("win_n"),
        col("baseline_sum_e6"), col("is_anomaly"))
      .orderBy("bucket")
  }
}

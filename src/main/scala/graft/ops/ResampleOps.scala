package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W1 RESAMPLE-COUNT — calendar-bucketed counts with ZERO-FILL for empty
  * buckets (reference `df.resample('D'/'W'/'M').size()`, `main.py:812-816`).
  *
  * Spark has no `resample`; gap-filling is explicit: generate the calendar
  * with `sequence(min, max, interval)` + `explode`, LEFT join the counts,
  * `coalesce(n, 0)`.
  *
  * Scale notes: the counts side is a single hash aggregate over the bucketed
  * timestamp (map-side partials); the calendar side is tiny (one row per
  * bucket — a few thousand even for decades of days) and broadcast by
  * Catalyst automatically, so the join adds no shuffle of the fact side.
  * The min/max scan is a cheap aggregate that column-prunes to the ts column
  * only. Bucket boundaries use `date_trunc` with ISO Monday weeks and
  * calendar-month starts (pinned by tests).
  */
object ResampleOps {
  sealed abstract class Freq(val truncUnit: String, val step: String)
  case object Daily extends Freq("day", "interval 1 day")
  case object Weekly extends Freq("week", "interval 1 week")
  case object Monthly extends Freq("month", "interval 1 month")

  /** Counts per calendar bucket over `tsCol`, zero-filled from the min to the
    * max observed bucket. Output: (bucket: date, n: long). */
  def resampleCount(df: DataFrame, tsCol: String, freq: Freq): DataFrame = {
    val bucket = to_date(date_trunc(freq.truncUnit, col(tsCol)))
    val counts = df
      .filter(col(tsCol).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val bounds = df
      .filter(col(tsCol).isNotNull)
      .agg(min(bucket).as("lo"), max(bucket).as("hi"))
    val calendar = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr(freq.step))).as("bucket"))
    calendar
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("bucket")
  }

  /** Trailing moving average over the gap-filled daily series: a
    * ROWS-frame window (k-1 preceding .. current) on the zero-filled
    * calendar — the gap-fill is what makes a rows-frame equal a
    * days-frame. The window is deliberately GLOBAL (unpartitioned,
    * single-task): its input is the already-aggregated calendar, whose row
    * count equals the number of DAYS in the span by construction — a few
    * thousand rows even for a decade — never the fact table. The heavy
    * lifting happened in resampleCount's distributed aggregate. */
  def movingAverageDaily(df: DataFrame, tsCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bucket")).rowsBetween(-(k - 1), Window.currentRow)
    resampleCount(df, tsCol, Daily)
      .withColumn("ma",
        round(avg(col("n").cast("double")).over(w), 6))
      .orderBy("bucket")
  }

  /** Generic resample-aggregate: same calendar gap-fill, arbitrary metric
    * expressions (zero-filled via the provided defaults). */
  def resampleAgg(
      df: DataFrame,
      tsCol: String,
      freq: Freq,
      aggs: Seq[(org.apache.spark.sql.Column, String, org.apache.spark.sql.Column)]): DataFrame = {
    val bucket = to_date(date_trunc(freq.truncUnit, col(tsCol)))
    val counts = df
      .filter(col(tsCol).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(aggs.head._1.as(aggs.head._2), aggs.tail.map(a => a._1.as(a._2)): _*)
    val bounds = df
      .filter(col(tsCol).isNotNull)
      .agg(min(bucket).as("lo"), max(bucket).as("hi"))
    val calendar = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr(freq.step))).as("bucket"))
    val filled = aggs.map { case (_, name, default) => coalesce(col(name), default).as(name) }
    calendar
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket") +: filled: _*)
      .orderBy("bucket")
  }

  /** TIME-DECAYED counts with EXACT integer half-life weights: every
    * event contributes 10^6 >> (age_days div halfLifeDays) micro-units —
    * exponential decay quantized to half-life buckets, so the "how much
    * recent signal does each event type carry" freshness report
    * (recency-weighted data valuation, decayed engagement scores) needs
    * no `pow`/`exp` double anywhere: the weight is one BIGINT shift,
    * bit-identical on any engine. Age is measured in whole days back
    * from the NEWEST event day in the data (deterministic — no
    * wall-clock), shifts cap at 30 (weight 0 beyond ~30 half-lives).
    * Returns per type: event count, newest/oldest day, exact
    * `decayed_e6` mass. One corpus aggregate; the as-of day derives from
    * a single-row broadcast max. */
  def decayedCounts(
      events: DataFrame, tsCol: String, typeCol: String,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"bad half-life: $halfLifeDays")
    val base = events.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("__day"))
    val asOf = base.agg(max(col("__day")).as("__as_of"))
    base
      .crossJoin(broadcast(asOf))
      .withColumn("__w", expr(
        s"shiftright(1000000L, cast(least(datediff(__as_of, __day) div $halfLifeDays, 30) as int))"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__day")).as("oldest_day"),
        max(col("__day")).as("newest_day"),
        sum(col("__w")).as("decayed_e6"))
      .orderBy("event_type")
  }
}

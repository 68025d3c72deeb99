package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range (interval) join — the second operator of the brief's
  * "Spark lacks it" pair (with [[AsofOps]]). Spark plans a plain
  * `point BETWEEN lo AND hi` join with no equi-key as a cartesian
  * product: |points| × |intervals| comparisons, hopeless at scale.
  *
  * Two formulations, picked by what the caller needs:
  *
  *  - [[rangeJoinPairs]] — the general form, when the qualifying
  *    (point, interval) PAIRS are the output. Bucketized equi-join:
  *    quantize the point axis into fixed-width buckets, replicate each
  *    interval into every bucket it overlaps (span/width + 1 copies),
  *    give each point its single bucket, equi-join on the bucket id,
  *    then apply the exact BETWEEN filter. Each qualifying pair meets
  *    exactly once (a point has ONE bucket), so no dedup is needed.
  *    Output is bounded below by the qualifying pairs themselves;
  *    `bucketDays` trades interval replication against per-bucket join
  *    width — size it near the typical interval span.
  *
  *  - [[pointInIntervalCounts]] — when only the per-point COUNT is
  *    needed, never materialize pairs at all. Sweep-line: each interval
  *    contributes +1 at `lo` and −1 at `hi`+1; the running sum of deltas
  *    in day order IS the open-interval count. O(|intervals| + |distinct
  *    days|) instead of O(qualifying pairs) — on the bench this replaced
  *    a 5.3 s bucketized count with a sub-second sweep. The cumulative
  *    window runs unpartitioned, which is safe exactly because the frame
  *    is the DISTINCT day axis (calendar-bounded: decades are ~10^4
  *    rows), not the interval set; the deltas are pre-aggregated
  *    map-side by the groupBy, so the window input stays tiny at any
  *    corpus size. */
object RangeOps {

  private def bucketOf(d: Column, bucketDays: Int): Column =
    floor(datediff(d, to_date(lit("1970-01-01"))) / bucketDays).cast("long")

  private def validIntervals(
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    intervals
      .select(col(loCol).as("__lo"), col(hiCol).as("__hi"))
      .filter(col("__lo").isNotNull && col("__hi").isNotNull &&
        col("__lo") <= col("__hi"))

  /** All qualifying (point, interval) pairs: one row per point (a DATE
    * column) per interval [loCol, hiCol] containing it, bounds inclusive.
    * Output columns: the point column plus `lo`/`hi`. */
  def rangeJoinPairs(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, "bucketDays must be >= 1")
    val iv = validIntervals(intervals, loCol, hiCol)
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__lo"), bucketDays), bucketOf(col("__hi"), bucketDays))))
    points
      .select(col(pointCol).as("__p"))
      .filter(col("__p").isNotNull)
      .withColumn("__bucket", bucketOf(col("__p"), bucketDays))
      .join(iv, "__bucket")
      .filter(col("__p").between(col("__lo"), col("__hi")))
      .select(col("__p").as(pointCol), col("__lo").as("lo"), col("__hi").as("hi"))
  }

  /** For each distinct point (a DATE column), the number of intervals
    * [loCol, hiCol] containing it (inclusive both ends), via the
    * sweep-line delta sum — no pair materialization. Returns (point, n)
    * with points that hit no interval ABSENT — callers zero-fill against
    * their own point set if needed.
    *
    * Scale shape: the running-sum window is deliberately GLOBAL
    * (unpartitioned, single task), and that is safe because its input is
    * BOUNDED BY THE CALENDAR, not the data: both sides of the merged day
    * axis are per-day aggregates (the deltas groupBy and the points
    * distinct), so the window sees ≤ 2·|distinct interval endpoints| +
    * |distinct point days| rows — days in the span, never interval or
    * point ROWS (PlanSpec-pinned). */
  def pointInIntervalCounts(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame = {
    val iv = validIntervals(intervals, loCol, hiCol)
    val deltas = iv.select(col("__lo").as("__day"), lit(1L).as("__delta"))
      .unionByName(iv.select(date_add(col("__hi"), 1).as("__day"), lit(-1L).as("__delta")))
      .groupBy("__day")
      .agg(sum(col("__delta")).as("__delta"))
    val pts = points
      .select(col(pointCol).as("__day"))
      .filter(col("__day").isNotNull)
      .distinct()
      .withColumn("__is_pt", lit(true))
    // running sum over the merged day axis: days carrying only deltas
    // keep the count moving; days carrying only points read it
    val w = Window.orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(pts, Seq("__day"), "full_outer")
      .withColumn("__n", sum(coalesce(col("__delta"), lit(0L))).over(w))
      .filter(col("__is_pt") && col("__n") > 0)
      .select(col("__day").as(pointCol), col("__n").as("n"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second operator of the brief's
  * "Spark lacks it" pair (with [[AsofOps]]). Spark plans a plain
  * `point BETWEEN lo AND hi` join with no equi-key as a cartesian
  * product: |points| × |intervals| comparisons, hopeless at scale.
  *
  * Scale formulation — BUCKETIZED equi-join: quantize the point axis into
  * fixed-width buckets, replicate each interval into every bucket it
  * overlaps (span/width + 1 copies), give each point its single bucket,
  * equi-join on the bucket id, then apply the exact BETWEEN filter. Each
  * qualifying (point, interval) pair meets exactly once (a point has ONE
  * bucket), so no dedup is needed. `bucketDays` trades replication factor
  * against per-bucket join size — size it near the typical interval span. */
object RangeOps {

  private def bucketOf(d: Column, bucketDays: Int): Column =
    floor(datediff(d, to_date(lit("1970-01-01"))) / bucketDays).cast("long")

  /** For each point (a DATE column), the number of intervals
    * [loCol, hiCol] containing it (inclusive both ends). Returns
    * (point, n) with points that hit no interval ABSENT — callers
    * zero-fill against their own point set if needed. */
  def pointInIntervalCounts(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, "bucketDays must be >= 1")
    val iv = intervals
      .select(col(loCol).as("__lo"), col(hiCol).as("__hi"))
      .filter(col("__lo").isNotNull && col("__hi").isNotNull &&
        col("__lo") <= col("__hi"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__lo"), bucketDays), bucketOf(col("__hi"), bucketDays))))
    points
      .select(col(pointCol).as("__p"))
      .filter(col("__p").isNotNull)
      .withColumn("__bucket", bucketOf(col("__p"), bucketDays))
      .join(iv, "__bucket")
      .filter(col("__p").between(col("__lo"), col("__hi")))
      .groupBy(col("__p").as(pointCol))
      .agg(count(lit(1)).as("n"))
  }
}

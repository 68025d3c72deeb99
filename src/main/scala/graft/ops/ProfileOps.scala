package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data profiling at ingest: the "what did we just load" sweep a 100 TB
  * pipeline runs before anything else touches the data — per-column null
  * counts, exact distinct cardinalities, and value/length ranges, all
  * from ONE scan of the table.
  */
object ProfileOps {

  /** Per-column profile in one pass: for each requested column, a row
    * `(col_name, n_nulls, n_distinct, min_metric, max_metric)` where the
    * metric is the value itself for integral columns and the character
    * LENGTH for string columns (so every profile row is uniformly
    * BIGINT, whatever the column type). `n_distinct` counts distinct
    * non-null values of the column itself (not the metric).
    *
    * Scale shape: a single global aggregate — Spark plans the multi
    * `countDistinct` via one Expand (factor = distinct columns + 1) over
    * ONE scan, partial-aggregated map-side, so the shuffle carries one
    * row per partition per expand branch, never data. The exact distinct
    * count is what the DuckDB oracle can verify; at 100 TB swap in
    * `approx_count_distinct` (HLL++, same plan minus the Expand) —
    * or [[SketchOps.hllRegisters]] when the sketch must be mergeable
    * across shards. The final explode-to-long-format runs on a single
    * one-row frame — driver-sized by construction. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def metric(c: String): Column = schema(c).dataType match {
      case StringType => length(col(c)).cast("long")
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
      case other =>
        throw new IllegalArgumentException(
          s"tableProfile supports integral and string columns; $c is $other")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        // coalesce: SUM over an empty table is NULL in both engines —
        // an empty table has zero nulls, not unknown-many
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(metric(c)).as(s"__mn_$c"),
        max(metric(c)).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_metric"),
        col(s"__mx_$c").as("max_metric"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_metric"), col("p.max_metric"))
      .orderBy("col_name")
  }

  /** The 100 TB form of [[tableProfile]]: `approx_count_distinct`
    * (HyperLogLog++, relative error `rsd`) instead of exact distincts.
    * Same output shape and column order. The win is the PLAN: no Expand —
    * every column's sketch accumulates in the SAME single partial
    * aggregate pass, so the scan cost does not grow with the number of
    * profiled columns and the shuffle stays one constant-size row per
    * partition. Use [[tableProfile]] when a gate must verify the count;
    * use this when the table is the corpus. */
  def tableProfileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def metric(c: String): Column = schema(c).dataType match {
      case StringType => length(col(c)).cast("long")
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
      case other =>
        throw new IllegalArgumentException(
          s"tableProfileApprox supports integral and string columns; $c is $other")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
        min(metric(c)).as(s"__mn_$c"),
        max(metric(c)).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_metric"),
        col(s"__mx_$c").as("max_metric"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_metric"), col("p.max_metric"))
      .orderBy("col_name")
  }
}

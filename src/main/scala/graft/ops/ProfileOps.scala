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

  // --- SHARD-MERGEABLE distinct sketches -------------------------------

  /** Per-COLUMN HLL register file — the MERGEABLE distinct-count artifact
    * a 100 TB statistics pipeline persists per shard: exact distinct
    * counts cannot merge across shards without re-touching data, but
    * register files merge by cell-wise MAX ([[mergeColumnRegisters]]) and
    * estimate at read time ([[columnDistinctEstimates]]). One stacked
    * scan over all requested columns (values ride as strings through the
    * shared md5 cell of [[SketchOps.hllCell]], so column type never
    * changes placement), one constant-bounded shuffle — at most
    * cols × 16^`bucketHex` rows survive the map-side combine. */
  def columnRegisters(df: DataFrame, cols: Seq[String], bucketHex: Int = 2): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val stacked = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.col_name"), col("s.v"))
      .filter(col("v").isNotNull)
    stacked
      .select(col("col_name"), SketchOps.hllCell(col("v"), bucketHex).as("c"))
      .groupBy(col("col_name"), col("c.bucket").as("bucket"))
      .agg(max(col("c.rho")).cast("long").as("register"))
  }

  /** Cell-wise MAX merge of per-shard register files: associative and
    * idempotent, so shards combine in any order and replayed shards
    * change nothing — merged == the whole-corpus build, bit-identically
    * (spec-pinned). Metadata-sized shuffle. */
  def mergeColumnRegisters(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "need at least one register file")
    parts.reduce(_ unionByName _)
      .groupBy(col("col_name"), col("bucket"))
      .agg(max(col("register")).as("register"))
  }

  /** Distinct-count estimates from a per-column register file — the HLL
    * harmonic-mean formula with linear-counting fallback, in the repo's
    * cross-engine-exact form: Σ 2^(-register) is computed as the EXACT
    * integer Σ 2^(61-register) over a DECIMAL(38,0) sum (order-free —
    * the double `pow` sum of the textbook form is summation-order
    * dependent), missing buckets contribute 2^61 each, and the single
    * division happens once at the end in one pinned operation order.
    * Returns (col_name, nonzero_buckets, estimate) — estimate rounded
    * 6 dp. */
  def columnDistinctEstimates(registers: DataFrame, bucketHex: Int = 2): DataFrame = {
    require(bucketHex >= 1 && bucketHex <= 3, s"bucketHex must be in [1, 3]: $bucketHex")
    val m = math.pow(16, bucketHex)
    val alpha = 0.7213 / (1 + 1.079 / m)
    val num = alpha * m * m * math.pow(2, 61)
    val two61 = 2305843009213693952L // 2^61
    registers
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("nonzero"),
        sum(expr("CAST(shiftleft(1L, CAST(61 - register AS INT)) AS DECIMAL(38,0))"))
          .as("sp"))
      .select(col("col_name"), col("nonzero"),
        (lit(num) / (col("sp") +
          (lit(m.toLong) - col("nonzero")).cast("decimal(38,0)") * lit(two61))
          .cast("double")).as("raw"))
      .select(col("col_name"),
        round(
          when(col("raw") <= lit(2.5 * m) && col("nonzero") < m.toLong,
            lit(m) * log(lit(m) / (lit(m) - col("nonzero")).cast("double")))
            .otherwise(col("raw")), 6).as("estimate"),
        col("nonzero").cast("long").as("nonzero_buckets"))
      .select(col("col_name"), col("nonzero_buckets"), col("estimate"))
      .orderBy("col_name")
  }

  /** JOIN-INTEGRITY profile — the referential pre-flight check every
    * multi-table pipeline stage needs BEFORE it joins (a silent 40%
    * orphan rate on doc_id ↔ vec_id quietly drops 40% of the corpus from
    * every downstream hybrid-search / SemDeDup stage): row and distinct-key
    * counts per side, matched-key count, and each side's orphan-key share
    * in ppm. One row out.
    *
    * 100 TB shape: each side collapses to its distinct keys first (one
    * key-keyed partial-agg shuffle per side — never rows), the match is
    * an inner join of the two key relations, and the three counts fold
    * into single-row aggregates. No row-level join ever happens. */
  def joinIntegrity(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lk = left.filter(col(leftKey).isNotNull)
      .select(col(leftKey).cast("long").as("k"))
    val rk = right.filter(col(rightKey).isNotNull)
      .select(col(rightKey).cast("long").as("k"))
    val lDist = lk.distinct()
    val rDist = rk.distinct()
    val counts = lk.agg(count(lit(1)).as("n_left"))
      .crossJoin(rk.agg(count(lit(1)).as("n_right")))
      .crossJoin(lDist.agg(count(lit(1)).as("n_left_keys")))
      .crossJoin(rDist.agg(count(lit(1)).as("n_right_keys")))
      .crossJoin(lDist.join(rDist, Seq("k")).agg(count(lit(1)).as("n_matched_keys")))
    counts.select(
      col("n_left"), col("n_right"),
      col("n_left_keys"), col("n_right_keys"), col("n_matched_keys"),
      expr("(n_left_keys - n_matched_keys) * 1000000 div n_left_keys")
        .as("left_orphan_ppm"),
      expr("(n_right_keys - n_matched_keys) * 1000000 div n_right_keys")
        .as("right_orphan_ppm"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each probe row, the latest build row with
  * `build.ts <= probe.ts` in the same key group. Spark has no native
  * operator for this (time-series point-in-time lookup); the naive
  * range-condition join explodes to |probe|×|build| per key before
  * filtering.
  *
  * Scalable formulation (per the brief's custom-operator preference:
  * compose existing ops before custom plans): tag both sides, union them,
  * and run ONE window over (key, ts) with a running `last(ignoreNulls)`
  * carrying the build payload forward — a single shuffle on the key, no
  * quadratic candidate set, naturally partitioned at any scale.
  *
  * Determinism contract: rows order by (ts, side, tie) with build rows
  * before probe rows at equal ts (the join is at-or-BEFORE inclusive), and
  * among build rows sharing (key, ts) the largest `tieCol` wins — the same
  * rule the oracle applies by deduplicating to max-tie before DuckDB's
  * native ASOF JOIN. */
object AsofOps {

  /** Returns every probe row (all original columns) plus `asof_match`: a
    * struct of the matched build row's (ts, tie, payload...), null when no
    * build row is at-or-before. Callers flatten the struct for
    * gate-compared output (struct columns are library-API-only, same rule
    * as arrays). */
  def asofJoin(
      probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, tieCol: String,
      buildPayload: Seq[String]): DataFrame =
    asofJoinDirected(probe, build, keyCol, tsCol, tieCol, buildPayload,
      forward = false, toleranceUs = None)

  /** Directional, optionally tolerance-bounded as-of join (pandas
    * `merge_asof(direction=, tolerance=)` surface):
    *  - `forward = false` — latest build row with build.ts <= probe.ts
    *    (the [[asofJoin]] semantics);
    *  - `forward = true` — EARLIEST build row with build.ts >= probe.ts
    *    (the same single window, ts ordered descending);
    *  - `toleranceUs` — a match farther than this many µs from the probe
    *    becomes null (post-filter on the carried struct; the window shape
    *    is unchanged). Timestamp columns compare in exact epoch-µs.
    * Both directions keep the equal-ts inclusive contract (build rows
    * sort before probe rows at the same ts) and the max-`tieCol`
    * tiebreak among equal-(key, ts) build rows. */
  def asofJoinDirected(
      probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, tieCol: String,
      buildPayload: Seq[String],
      forward: Boolean, toleranceUs: Option[Long]): DataFrame = {
    val matchCols = (Seq(tsCol, tieCol) ++ buildPayload).distinct
    val bMatch = struct(matchCols.map(col): _*)
    val bType = build.select(bMatch.as("m")).schema.head.dataType
    val isTs = probe.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampType
    val pStruct = struct(probe.columns.map(col): _*)
    val pType = probe.select(pStruct.as("p")).schema.head.dataType
    val b = build.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), col(tieCol).as("__tie"),
      lit(0).as("__side"), bMatch.as("__m"), lit(null).cast(pType).as("__pp"))
    val p = probe.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), col(tieCol).as("__tie"),
      lit(1).as("__side"), lit(null).cast(bType).as("__m"), pStruct.as("__pp"))
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tOrd, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = b.unionByName(p)
      .withColumn("__asof", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceUs match {
      case None => joined.withColumn("__out", col("__asof"))
      case Some(tol) =>
        def us(c: org.apache.spark.sql.Column) =
          if (isTs) unix_micros(c) else c.cast("long")
        joined.withColumn("__out",
          when(col("__asof").isNotNull &&
            abs(us(col(s"__asof.$tsCol")) - us(col("__t"))) <= tol, col("__asof"))
            .otherwise(lit(null).cast(bType)))
    }
    bounded.select(col("__pp.*"), col("__out").as("asof_match"))
  }
}

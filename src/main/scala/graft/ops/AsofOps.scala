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
      buildPayload: Seq[String]): DataFrame = {
    val matchCols = (Seq(tsCol, tieCol) ++ buildPayload).distinct
    val bMatch = struct(matchCols.map(col): _*)
    val bType = build.select(bMatch.as("m")).schema.head.dataType
    val pStruct = struct(probe.columns.map(col): _*)
    val pType = probe.select(pStruct.as("p")).schema.head.dataType
    val b = build.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), col(tieCol).as("__tie"),
      lit(0).as("__side"), bMatch.as("__m"), lit(null).cast(pType).as("__pp"))
    val p = probe.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), col(tieCol).as("__tie"),
      lit(1).as("__side"), lit(null).cast(bType).as("__m"), pStruct.as("__pp"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("__asof", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__pp.*"), col("__asof").as("asof_match"))
  }
}

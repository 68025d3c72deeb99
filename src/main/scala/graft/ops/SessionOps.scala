package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the SQL-expressible counterpart of
  * [[graft.streaming.StreamingOps.sessionize]] (same gap semantics), so the
  * two execution modes can be cross-checked and the batch side is
  * oracle-verifiable.
  *
  * Gaps-and-islands: a session starts where the gap to the previous event
  * of the same user exceeds `gapSeconds`; the running sum of starts numbers
  * the sessions. Two windows over the same (user, ts, id) ordering — one
  * shuffle on user_id, both windows reuse the sort. */
object SessionOps {

  def sessionizeBatch(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      valueCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val secs = unix_timestamp(col(tsCol))
    val isStart = when(
      lag(secs, 1).over(order).isNull || secs - lag(secs, 1).over(order) > gapSeconds, 1L)
      .otherwise(0L)
    events
      .withColumn("__start", isStart)
      .withColumn("session_id", sum(col("__start")).over(running))
      .groupBy(col(userCol).as("user_id"), col("session_id"))
      .agg(
        // Session bounds as epoch-MICROSECOND BIGINTs: min/max commute with
        // the µs truncation, and a raw int64 has one representation in every
        // engine — no parquet timestamp-unit variance (Spark INT96 vs µs).
        unix_micros(min(col(tsCol))).as("session_start"),
        unix_micros(max(col(tsCol))).as("session_end"),
        count(lit(1)).as("n_events"),
        // Scaled-int ×10^6 BIGINT, not decimal: per-row decimal(18,6)
        // rounding (engine-agreed) then an exact int64 sum — one
        // representation everywhere (decimals export as float64 from the
        // oracle client and hash-diverge on trailing zeros).
        sum((col(valueCol).cast("decimal(18,6)") * 1000000).cast("long"))
          .as("total_value_e6"))
      .orderBy(col("user_id"), col("session_id"))
  }
}

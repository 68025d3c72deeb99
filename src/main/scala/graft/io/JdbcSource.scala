package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** S1 `JDBC-SCAN` (partitioned) — re-expression of the reference's
  * month-by-month serial fetch loop (reference `main.py:240-306`): the
  * driver-side tumbling-window loop "to manage memory" becomes Spark's
  * partitioned JDBC read — N executors each fetch one slice of the
  * partition column range concurrently, and the date/not-null predicates
  * push down into the database's WHERE clause.
  *
  * Untestable without a live database in this environment; the builder is
  * kept trivially thin so all logic that CAN be wrong (option names,
  * predicate strings) is visible and unit-checkable.
  */
object JdbcSource {

  /** Reader for `table` sliced into `numPartitions` ranges of
    * `partitionCol` over [lower, upper). Extra predicates (e.g.
    * "text IS NOT NULL") are pushed into the generated queries. */
  def partitionedReader(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: String,
      upper: String,
      numPartitions: Int,
      user: String,
      password: String,
      extraOptions: Map[String, String] = Map.empty): DataFrameReader = {
    val r = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions.toString)
      .option("user", user)
      .option("password", password)
      // sane large-scale defaults: server-side cursors, batched fetch
      .option("fetchsize", "10000")
    extraOptions.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** The reference's effective scan (`main.py:269-274`) as a pushed-down
    * query: projection + date window + not-null filter happen in the DB. */
  def postsQuery(table: String, tsCol: String, textCol: String,
      start: String, end: String): String =
    s"""SELECT text, full_date, channel_username, views FROM $table
WHERE $tsCol >= '$start' AND $tsCol < '$end' AND $textCol IS NOT NULL"""
}

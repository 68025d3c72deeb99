package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over a scale-factor directory
  * (`/root/testdata/sf{N}/<name>.parquet` — see /root/repo/TESTDATA.md).
  *
  * Scale note: plain `spark.read.parquet` keeps Catalyst's column pruning and
  * predicate pushdown intact — downstream `select`/`filter` reach the scan as
  * `ReadSchema`/`PushedFilters`. Never pre-`.cache()` here; callers decide
  * what is worth persisting.
  *
  * Scan parallelism: parquet splits at ROW-GROUP granularity, so a
  * single-row-group file scans as ONE partition no matter what
  * `maxPartitionBytes` says — and every per-row expression downstream runs
  * on one core. [[load]] therefore rebalances a scan whose split count is
  * below the session's core count (the local single-file case). On a real
  * multi-file/multi-row-group dataset the condition is false and no shuffle
  * is added; filters and pruning push through the `Repartition` node either
  * way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose consumers do heavy per-row compute (md5/shingling,
    * regex tagging, vector math). Only these are worth an extra exchange
    * when the scan has fewer splits than cores; relational tables are
    * cheaper to decode single-threaded than to re-shuffle (measured at
    * sf0.1: q12 0.23s raw vs 0.59s rebalanced). */
  private val computeHeavy = Set("documents", "embeddings")

  /** Test-only chaos hook: when `graft.test.repartition` is set to n > 0,
    * every table is hash-repartitioned on all of its columns into n
    * partitions right after the scan. Downstream results must be IDENTICAL
    * with or without it — that is the engine's distributed-determinism
    * contract (partial aggregation order, window ties, LSH bucket fills
    * and iteration schedules must not leak partitioning into values).
    * `CatalogDeterminismSpec` runs the whole catalog both ways. Never set
    * outside tests. */
  private val testRepartitionKey = "graft.test.repartition"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val testParts = spark.conf.get(testRepartitionKey, "0").toInt
    if (testParts > 0)
      return df.repartition(testParts, df.columns.map(org.apache.spark.sql.functions.col): _*)
    val cores = spark.sparkContext.defaultParallelism
    if (computeHeavy.contains(name) && df.rdd.getNumPartitions < cores)
      df.repartition(cores)
    else df
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")

  /** The events table's `ts` physical layout has varied across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark's µs TimestampType
    * cannot represent directly — read as raw long via the legacy conf and
    * integer-`div` truncated, never via double, which loses precision above
    * 2^53 ns) and plain parquet timestamp[us] without timezone (which Spark 4
    * infers as TIMESTAMP_NTZ). Adapt on the scanned type so both layouts
    * surface the same TimestampType `ts`; the session timezone is pinned to
    * UTC, so the NTZ→timestamp cast preserves wall-clock values — identical
    * to what the DuckDB oracle reads off the same file. */
  private def adaptTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case t => throw new IllegalStateException(s"unexpected events.ts type: $t")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptTs(load(spark, sfDir, "events"))
  }
  /** Streaming view of an events-shaped parquet DIRECTORY: same
    * timestamp-layout handling as [[events]], via `readStream` (new files
    * appearing in the directory become new micro-batches). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    adaptTs(spark.readStream.schema(schema).parquet(dir))
  }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")

  /** Register every table as a temp view so the whole engine surface is
    * reachable from `spark.sql(...)`. `events` needs its nanos-timestamp
    * conversion, so it goes through its dedicated loader. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended local-mode settings.
  *
  * Design notes for cluster scale (the library itself is deployment-agnostic;
  * only this helper pins local-mode values):
  *   - shuffle partitions sized to cores locally; on a real cluster AQE
  *     coalesces post-shuffle partitions so an over-provisioned static value
  *     is safe.
  *   - AQE on: runtime re-planning (skew-join splitting, dynamic coalesce,
  *     broadcast-join demotion/promotion) is the main lever at 100 TB.
  */
object GraftSession {
  def local(
      cores: Int = 32,
      appName: String = "graft",
      extraConfigs: Map[String, String] = Map.empty): SparkSession = {
    val base = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
    val spark = extraConfigs.foldLeft(base) { case (b, (k, v)) => b.config(k, v) }
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // coalesce to the target partition size instead of max parallelism
      // (the Spark tuning guide's own recommendation): post-shuffle stages
      // over small intermediates collapse to few tasks, cutting per-task
      // overhead locally AND scheduler pressure on a 1000-executor cluster
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft SQL functions + the literal-rlike optimizer rule are part of
    // the engine's standard surface (idempotent registration)
    graft.sql.GraftFunctions.register(spark)
    spark
  }
}

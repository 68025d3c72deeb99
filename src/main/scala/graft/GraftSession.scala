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
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // ADVISORY POST-SHUFFLE PARTITION SIZE (r13, measured): with
      // parallelism-first off (deliberate: r13 measured `true` fanning
      // sub-MB stages into extra tasks whose scheduling overhead cost the
      // sub-second catalog queries ~15% — median ratio 1.15, total 203.9 s
      // → 224.0 s) the advisory size is the ONE knob that decides how much
      // of the machine a post-shuffle stage uses. The Spark default 64 MB
      // coalesced every 1-12 MB intermediate to ONE task, serializing the
      // engine's compute-heavy post-shuffle stages (pair generation,
      // cosine kernels, verify joins) onto a single core while 31 idled —
      // JobProfile showed q123's two verify stages at 1.6 s/task each.
      // This is a SCALE-DEPENDENT setting, so it is parameterised
      // (SPARK_GRAFT_ADVISORY_MB): the local default matches the sandbox's
      // compute-per-byte shape (catalog stages are pair-explosion kernels
      // over small shuffled bytes, so partitions must be small enough that
      // a stage's CPU work spreads across cores); production inputs are
      // GB-TB per stage where the guide's 100-256 MB advisory keeps
      // shuffle blocks large — set the env accordingly on a cluster.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_MB", "2") + "m")
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

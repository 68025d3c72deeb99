package graft
/** Driver-run benchmark: warmup pass + best-of-2 timed passes over the whole
  * query catalog; prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench")
    // Materialize through the `noop` sink, NOT `.count()`: count() lets
    // Catalyst prune every payload column (a simhash/fingerprint query would
    // be benched without computing its kernel); noop forces full row
    // production with zero write cost.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Untimed warmup pass: JIT + codegen + parquet footer caches. The timed
    // passes below measure steady-state query throughput, which is what a
    // long-running engine delivers.
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // Best-of-2 timed passes: one GC pause / scheduling hiccup should not
    // define a query's reported steady-state latency.
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (p1, p2) = (timedPass(), timedPass())
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // The driver captures a bounded TAIL of stdout; with 90+ queries the line
    // above can lose its front (including the total) to truncation. Emit a
    // compact summary LAST so the tail always carries the totals + the
    // slowest-10 queries, whatever the catalog size.
    val slowest = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total_last","value":$total,"unit":"sec","n_queries":${results.size},"slowest":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}

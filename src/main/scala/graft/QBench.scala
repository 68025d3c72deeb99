package graft

/** Single-query micro-bench: `runMain graft.QBench <query> <sfDir> [passes]`
  * — times one catalog query through the same noop-sink path as
  * [[Bench]], printing every pass (pass 1 includes JIT/codegen warmup).
  * Dev tool for plan iteration; the driver's numbers come from [[Bench]]. */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-qbench")
    val fn = SparkEntry.queries(name)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qbench] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

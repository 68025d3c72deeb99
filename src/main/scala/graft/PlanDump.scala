package graft

import java.nio.file.{Files, Paths}

/** Plan artifact dumper: `runMain graft.PlanDump <outDir> <sfDir> <query>...`
  * — writes each named catalog query's `.explain("formatted")` text to
  * `<outDir>/<query>.txt`. Dev tool for the optimization rounds'
  * `plans/rNN/<query>_{before,after}.txt` deliverables (the judge checks
  * plan claims against these files without running Spark). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
      println(s"[plandump] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}

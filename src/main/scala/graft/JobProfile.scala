package graft

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Per-JOB profile of one catalog query: `runMain graft.JobProfile
  * <query> [sfDir] [passes]` — runs the query through the bench's noop
  * sink with a listener recording every job's wall time, task count and
  * shuffle bytes, then prints the steady-state pass's job breakdown.
  * Dev tool for the optimization rounds: a catalog query at sf0.1 is
  * dominated by HOW MANY jobs/shuffles it runs, and this shows exactly
  * which localCheckpoint / count / action the seconds belong to. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-jobprofile")
    val fn = SparkEntry.queries(name)

    case class JobRow(id: Int, t0: Long, var t1: Long = 0L,
        var nTasks: Int = 0, var shufRead: Long = 0L, var shufWrite: Long = 0L,
        var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stageToJob = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRow(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for (j <- stageToJob.get(e.stageId); r <- jobs.get(j)) {
          r.nTasks += 1
          val m = e.taskMetrics
          if (m != null) {
            r.shufRead += m.shuffleReadMetrics.totalBytesRead
            r.shufWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    })

    (1 to passes).foreach { i =>
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[jobprofile] $name pass $i: $wall%.3f s")
      if (i == passes) {
        Thread.sleep(500) // let the listener bus drain
        val rows = jobs.synchronized(jobs.values.toSeq)
        val jobSum = rows.map(r => (r.t1 - r.t0) / 1e3).sum
        println(f"[jobprofile] jobs=${rows.size} jobSum=$jobSum%.3f s  (wall-jobSum=${wall - jobSum}%.3f s driver/planning)")
        rows.foreach { r =>
          println(f"[jobprofile]   job ${r.id}%3d  ${(r.t1 - r.t0) / 1e3}%7.3f s  tasks=${r.nTasks}%4d  shufR=${r.shufRead / 1024}%8dK shufW=${r.shufWrite / 1024}%8dK  ${r.desc.take(80)}")
        }
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    GraftSession.local(cores = 4, appName = "graft-test",
      extraConfigs = Map("spark.sql.warehouse.dir" -> wh))
  }
}

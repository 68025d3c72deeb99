package graft

import graft.io.Tables
import graft.model.Defaults
import graft.pipeline.Pipeline
import graft.text.SimpleAnalyzer
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end reference-equivalent run (SURVEY §3.3) off one cached stage. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("full pipeline: all reports non-empty, one shared cached stage") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val report = Pipeline.run(docs, Defaults.config, SimpleAnalyzer(Defaults.config.stopwords))
    try {
      assert(report.sharedStage.storageLevel != StorageLevel.NONE, "clean+tag stage must be cached")
      val counts = report.industryCounts.collect()
      assert(counts.length == 5)
      // consistency: per-industry counts sum to the exploded row count
      assert(counts.map(_.getLong(1)).sum == report.sharedStage
        .selectExpr("explode(industries)").count())
      assert(report.topPosts.count() > 0)
      assert(report.topChannelsByViews.count() > 0)
      assert(report.mostActiveChannels.count() > 0)
      assert(report.keywordBreakdown.count() == 15) // 5 industries x 3 keywords
      assert(report.wordFrequency.count() > 0)
      assert(report.wordFrequencyByIndustry.count() > 0)
      assert(report.channelAudit.count() > 0)
      assert(report.timeSeries.isEmpty) // documents has no timestamp column
      val out = java.nio.file.Files.createTempDirectory("graft_reports").toString
      Pipeline.writeReports(report, out)
      assert(new java.io.File(s"$out/industry_counts").exists())
    } finally Pipeline.unpersist(report)
  }
}

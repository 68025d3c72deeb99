package graft

import java.nio.file.{Files, Paths}
import graft.io.CsvRepair
import graft.model.{AnalysisConfig, PostsMapping, Taxonomy}
import graft.pipeline.Pipeline
import graft.text.UnicodeAnalyzer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end test (SURVEY §5.4 / FIXTURES.md §A): a reference-shaped
  * posts CSV exercising every documented ingest/clean phenomenon runs
  * through the REAL entry path — repairing CSV scan → lenient coercion →
  * `Pipeline.run` → report sinks — and each report must byte-match a
  * checked-in golden CSV.
  *
  * Fixture phenomena (see fixtures/golden_posts.csv):
  *  - literal `\n` corruption inside a quoted field (row 4, `main.py:1008`)
  *  - unparseable date → row dropped (row 8, `main.py:1039`)
  *  - garbage views → 0 (row 9, `main.py:1042`)
  *  - malformed line (wrong arity) → dropped
  *  - blacklist case collisions (rows 6/7 vs config `BadChan`, `main.py:351`)
  *  - noise-regex hit (row 5)
  *  - keyword with regex metacharacters (`c++`) matched literally
  *  - multi-industry overlap (row 3 → Cars AND Food, double-counted by design)
  *  - ZWNJ Persian form + lemma map (row 11)
  *  - views tie across industries (rows 3/12 at 70 — id tiebreak)
  *  - an empty calendar week (Jan 15) → zero-filled in the weekly resample
  *
  * Regenerate goldens after an INTENTIONAL semantic change with:
  * `GOLDEN_UPDATE=1 sbt "testOnly graft.GoldenPipelineSpec"` — then review
  * the diff by hand before committing.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fixtureDir = "src/test/resources/fixtures"
  private val goldenDir = "src/test/resources/golden"

  private val cfg = AnalysisConfig(
    taxonomy = Taxonomy(Seq(
      "Cars" -> Seq("car", "c++"),
      "Food" -> Seq("pizza", "tea"))),
    channelBlacklist = Seq("BadChan"),
    noisePatterns = Seq("spam\\s+offer"),
    stopwords = Seq("the", "and"),
    posts = PostsMapping(
      idCol = "post_id", textCol = "text",
      channelCol = "channel_username", viewsCol = "views",
      tsCol = Some("full_date")))

  private val analyzer = UnicodeAnalyzer(
    stopwords = cfg.stopwords,
    lemmas = Map("چای‌ها" -> "چای"))

  test("golden: repaired fixture through Pipeline.run byte-matches checked-in reports") {
    val schema = StructType(Seq("post_id", "text", "full_date", "channel_username", "views")
      .map(StructField(_, StringType)))
    val posts = CsvRepair
      .coercePosts(
        CsvRepair.readRepaired(spark, s"$fixtureDir/golden_posts.csv", schema),
        "full_date", "views")
      .withColumn("post_id", col("post_id").cast("long"))

    val report = Pipeline.run(posts, cfg, analyzer, wordTopN = 50)
    try {
      val out = Files.createTempDirectory("graft_golden").toString
      Pipeline.writeReports(report, out)
      graft.io.Sinks.writeReportCsv(report.topPosts, s"$out/top_posts")
      graft.io.Sinks.writeReportCsv(report.timeSeries.get, s"$out/time_series")

      val names = Seq("industry_counts", "keyword_breakdown", "word_frequency",
        "channel_audit", "top_posts", "time_series")
      for (name <- names) {
        val produced = new java.io.File(s"$out/$name").listFiles()
          .filter(_.getName.endsWith(".csv")).head.toPath
        val goldenPath = Paths.get(s"$goldenDir/$name.csv")
        if (sys.env.contains("GOLDEN_UPDATE")) {
          Files.copy(produced, goldenPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } else {
          assert(Files.exists(goldenPath),
            s"missing golden $goldenPath — run with GOLDEN_UPDATE=1 and review")
          val got = Files.readString(produced)
          val want = Files.readString(goldenPath)
          assert(got == want, s"report '$name' diverged from golden:\n--- got\n$got--- want\n$want")
        }
      }
      assert(!sys.env.contains("GOLDEN_UPDATE"), "goldens regenerated — review and re-run without GOLDEN_UPDATE")
    } finally Pipeline.unpersist(report)
  }

  test("golden fixture drops exactly the documented rows") {
    val schema = StructType(Seq("post_id", "text", "full_date", "channel_username", "views")
      .map(StructField(_, StringType)))
    val coerced = CsvRepair
      .coercePosts(
        CsvRepair.readRepaired(spark, s"$fixtureDir/golden_posts.csv", schema),
        "full_date", "views")
    // date-dropped: row 8 (bad date) + garbage line; survivors keep ids 1-7,9-12
    assert(coerced.select("post_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1", "10", "11", "12", "2", "3", "4", "5", "6", "7", "9"))
    // views coercion: row 9 'notanumber' -> 0
    assert(coerced.filter(col("post_id") === "9").select("views").head.getLong(0) == 0L)
    // repair: row 4's literal backslash-n became a space
    assert(coerced.filter(col("post_id") === "4").select("text").head.getString(0)
      == "love c++ and car racing")
  }
}

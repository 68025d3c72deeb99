package graft

import graft.model.{AnalysisConfig, Defaults, PostsMapping, Taxonomy}
import graft.ops.{KeywordOps, ResampleOps}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics lifted from the reference (SURVEY §5 edge list): null text,
  * case-insensitive blacklist, regex-escaped keywords vs raw noise patterns,
  * overlapping tags, zero-filled resample. */
class KeywordOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tax = Taxonomy(Seq(
    "A" -> Seq("alpha", "a+b"), // 'a+b' exercises regex escaping (literal match)
    "B" -> Seq("beta")))
  private val cfg = AnalysisConfig(
    taxonomy = tax,
    channelBlacklist = Seq("BadChan"),
    noisePatterns = Seq("spam+y"), // UNESCAPED regex: matches spamy/spammy
    stopwords = Seq("the"),
    posts = PostsMapping("id", "text", "chan", "views"))

  private def posts = Seq(
    (1L, "alpha news", "good", 10L),
    (2L, "a+b formula", "good", 20L),        // literal a+b must match
    (3L, "aab formula", "good", 30L),        // regex a+b would match this; escaped must NOT
    (4L, "alpha and beta", "good", 40L),     // overlapping: tagged A and B
    (5L, "alpha here", "BADCHAN", 50L),      // blacklisted channel, any case
    (6L, "beta spammmy", "good", 60L),       // noise regex hit -> dropped
    (7L, null.asInstanceOf[String], "good", 70L), // null text -> dropped
    (8L, "nothing relevant", "good", 80L)    // no keyword -> dropped
  ).toDF("id", "text", "chan", "views")

  test("clean: escaping, blacklist case-insensitivity, noise regex, null text") {
    val ids = KeywordOps.clean(posts, cfg).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L))
  }

  test("tagArray: overlapping industries both tagged") {
    val tagged = KeywordOps.cleanExploded(posts, cfg)
      .select("id", "industry").as[(Long, String)].collect().toSet
    assert(tagged == Set((1L, "A"), (2L, "A"), (4L, "A"), (4L, "B")))
  }

  test("tagBooleans matches tagArray semantics") {
    val df = KeywordOps.tagBooleans(KeywordOps.clean(posts, cfg), tax, "text")
    val rows = df.select("id", "is_A", "is_B").as[(Long, Boolean, Boolean)].collect().toSet
    assert(rows == Set((1L, true, false), (2L, true, false), (4L, true, true)))
  }

  test("anyIndustry (P8 any-match mask) equals the first-pass keyword filter") {
    val viaAny = KeywordOps.anyIndustry(posts, tax, "text").select("id").as[Long].collect().toSet
    val viaFilter = KeywordOps.keywordFilter(posts, tax, "text").select("id").as[Long].collect().toSet
    assert(viaAny == viaFilter)
    // pre-blacklist/pre-noise: any LITERAL keyword hit (row 3 'aab' must
    // not match the escaped 'a+b'; nulls and no-hit rows drop)
    assert(viaAny == Set(1L, 2L, 4L, 5L, 6L))
  }

  test("resample zero-fills interior gaps") {
    val ts = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-04 09:00:00"))
    ).toDF("id", "ts")
    val out = ResampleOps.resampleCount(ts, "ts", ResampleOps.Daily)
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(2L, 0L, 0L, 1L))
    assert(out.map(_._1.toString) == Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
  }

  test("Aho-Corasick tags agree with the regex-alternation definition") {
    import org.apache.spark.sql.functions._
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
    val tax = graft.model.Defaults.taxonomy
    val viaRegex = tax.industries.map { case (ind, _) =>
      when(col("text").rlike(tax.patternFor(ind)), lit(ind))
    }
    val both = docs.select(
      graft.functions.KeywordMatch.multiKeywordTags(col("text"), tax.industries).as("ac"),
      filter(array(viaRegex: _*), _.isNotNull).as("re"))
    assert(both.filter(not(col("ac") === col("re"))).count() == 0)
  }

  test("multiKeywordTags edge cases: empty text, overlap, unicode, null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tax = Seq("A" -> Seq("ab", "xyz"), "B" -> Seq("bc"), "Fa" -> Seq("آلو"))
    val df = Seq(Some("xabcx"), Some(""), Some("zz"), None, Some("آلوم"))
      .toDF("t")
    val out = df.select(graft.functions.KeywordMatch.multiKeywordTags(col("t"), tax).as("tags"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0).toList)
    assert(out(0) == List("A", "B")) // "ab" and "bc" overlap in "abc"
    assert(out(1) == Nil)
    assert(out(2) == Nil)
    assert(out(3) == null)
    assert(out(4) == List("Fa"))
  }

  test("default config keyword escaping produces valid union pattern") {
    assert(Defaults.config.taxonomy.unionPattern.nonEmpty)
    assert(tax.unionPattern == "(alpha|a\\+b|beta)")
  }
}

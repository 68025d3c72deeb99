package graft

import graft.io.Tables
import graft.ops.CurationOps
import org.scalatest.funsuite.AnyFunSuite

class CurationOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("funnel stages are a hand-checked monotone cascade") {
    import spark.implicits._
    // corpus = ids 1-5 (10 is the bench doc). 2 duplicates 1 (dedup), 3
    // equals the bench text (decontamination), 5 is too short (quality),
    // budget=10 keeps exactly one 8-token survivor.
    val df = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (2L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (3L, "wwww xxxx yyyy zzzz awww bxxx cyyy dzzz"),
      (4L, "eeee ffff gggg hhhh iiii jjjj kkkk llll"),
      (5L, "mmmm nnnn"),
      (10L, "wwww xxxx yyyy zzzz awww bxxx cyyy dzzz"))
      .toDF("doc_id", "text")
    val rows = CurationOps.curationFunnel(df, "text", "doc_id",
      stopwords = Seq("the"), minTokens = 3, maxTokens = 50, minStops = 0,
      prefixLen = 2, w = 2, benchMod = 10,
      maxOverlapNum = 1, maxOverlapDen = 2, budget = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0L, "raw", 5L, 34L),
      (1L, "quality", 4L, 32L),
      (2L, "dedup", 3L, 24L),
      (3L, "decontaminated", 2L, 16L),
      (4L, "budget", 1L, 8L)))
  }

  test("funnel on the corpus is monotone non-increasing and never empties stage 0") {
    val rows = CurationOps.curationFunnel(
      Tables.documents(spark, sf), "text", "doc_id",
      stopwords = graft.model.Defaults.config.stopwords,
      minTokens = 30, maxTokens = 1000, minStops = 3,
      prefixLen = 8, w = 3, benchMod = 20,
      maxOverlapNum = 1, maxOverlapDen = 2, budget = 4000L)
      .collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.head.getLong(2) > 0, "raw stage must see the corpus")
    val docs = rows.map(_.getLong(2))
    val toks = rows.map(_.getLong(3))
    docs.zip(docs.tail).foreach { case (a, b) => assert(a >= b, "doc funnel must shrink") }
    toks.zip(toks.tail).foreach { case (a, b) => assert(a >= b, "token funnel must shrink") }
  }
}

package graft

import graft.ops.BpeOps
import org.scalatest.funsuite.AnyFunSuite

class BpeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("applyMerge merges greedily left-to-right without overlap") {
    assert(BpeOps.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeOps.applyMerge(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    assert(BpeOps.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(BpeOps.applyMerge(Seq.empty, "a", "b") == Seq.empty)
  }

  test("bpeTrain learns the textbook merge sequence on the classic fixture") {
    import spark.implicits._
    // Sennrich et al.'s worked example: {low:5, lower:2, newest:6, widest:3}
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = BpeOps.bpeTrain(docs, "text", rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)), s"got ${merges.toSeq}")
  }

  test("bpeTrain stops early when every word is fully merged") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeOps.bpeTrain(docs, "text", rounds = 10).collect()
    // one merge (a,b) exhausts the corpus
    assert(merges.length == 1)
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "b")
  }

  test("round-1 pair counts equal bpeTrain's first learned pair") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower newest")).toDF("doc_id", "text")
    val top = BpeOps.adjacentPairCounts(BpeOps.wordCounts(docs, "text"))
      .collect().head
    val first = BpeOps.bpeTrain(docs, "text", rounds = 1).collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      (first.getString(1), first.getString(2), first.getLong(3)))
  }

  test("bpeEncode with no merges counts characters; full merges count words") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val none = BpeOps.bpeEncode(docs, "text", "doc_id", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none == Map(1L -> 4L, 2L -> 3L))
    val merged = BpeOps.bpeEncode(docs, "text", "doc_id",
      Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == Map(1L -> 2L, 2L -> 1L))
  }
}

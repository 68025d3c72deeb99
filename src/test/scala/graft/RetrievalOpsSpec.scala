package graft

import graft.io.Tables
import graft.ops.RetrievalOps
import org.scalatest.funsuite.AnyFunSuite

class RetrievalOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, sf)

  test("inverted index stats match a hand-built fixture") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "a"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = RetrievalOps.invertedIndexStats(df, "text", "doc_id", minDf = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // a: docs 1(tf2), 3(tf1); b: 1(tf1), 2(tf1); c: 2(tf1)
    assert(got.toSeq == Seq(
      ("a", 2L, 3L, 2L, 1L, 3L, 4L),
      ("b", 2L, 2L, 1L, 1L, 2L, 3L),
      ("c", 1L, 1L, 1L, 2L, 2L, 2L)))
    // minDf prunes the hapax term
    val pruned = RetrievalOps.invertedIndexStats(df, "text", "doc_id", minDf = 2)
      .collect().map(_.getString(0))
    assert(pruned.toSeq == Seq("a", "b"))
  }

  test("bm25 ranks the heavier matching doc first and sums multi-term hits") {
    import spark.implicits._
    // doc 1 mentions "spark" twice in a short doc; doc 2 once in a longer
    // doc; doc 3 matches both query terms so it must out-rank single-term
    // docs for the two-term query; doc 4 matches nothing
    val df = Seq(
      (1L, "spark spark fast"),
      (2L, "spark slow slow slow slow slow"),
      (3L, "spark stream"),
      (4L, "other words only"))
      .toDF("doc_id", "text")
    val out = RetrievalOps.bm25TopK(df, "text", "doc_id",
      Seq("q1" -> Seq("spark", "stream")), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ranked = out.map(t => t._3)
    assert(ranked.toSeq == Seq(3L, 1L, 2L), s"got $out")
    // doc 3 hit both terms
    assert(out.find(_._3 == 3L).get._5 == 2L)
    // scores strictly positive and descending
    val scores = out.map(_._4)
    assert(scores.forall(_ > 0) && scores.sameElements(scores.sorted.reverse))
  }

  test("bm25 postings are pruned to query terms before the tf shuffle") {
    val out = RetrievalOps.bm25TopK(docs, "text", "doc_id",
      Seq("q" -> Seq("spark")), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi-join prune in:\n$plan")
    assert(out.count() == 5)
  }

  test("bm25 from a persisted index survives write/reload bit-identically and prunes the scan") {
    import org.apache.spark.sql.functions.col
    val qs = Seq("qa" -> Seq("join", "filter"), "qb" -> Seq("spark", "stream"))
    val direct = RetrievalOps.bm25TopK(docs, "text", "doc_id", qs, k = 10)
      .collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    // term-sorted postings files so row-group min/max stats prune terms
    RetrievalOps.bm25Postings(docs, "text", "doc_id")
      .repartitionByRange(4, col("term")).sortWithinPartitions("term")
      .write.parquet(s"$dir/postings")
    RetrievalOps.docLengths(docs, "text", "doc_id").write.parquet(s"$dir/dl")
    val fromIdx = RetrievalOps.bm25FromIndex(
      spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/dl"), qs, k = 10)
    assert(fromIdx.collect().toSeq == direct,
      "indexed retrieval must reproduce the direct path bit-for-bit")
    // the query-term filter reaches the postings parquet scan
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"expected a pushed In(term, ...) filter on the postings scan in:\n${plan.take(1500)}")
  }

  test("bm25 is deterministic across repartitionings (integer-micro scores)") {
    val a = RetrievalOps.bm25TopK(docs, "text", "doc_id",
      Seq("qa" -> Seq("join", "filter"), "qb" -> Seq("fast", "scan", "vector")), k = 12)
      .collect().toSeq
    val b = RetrievalOps.bm25TopK(docs.repartition(7), "text", "doc_id",
      Seq("qa" -> Seq("join", "filter"), "qb" -> Seq("fast", "scan", "vector")), k = 12)
      .collect().toSeq
    assert(a == b)
  }
}

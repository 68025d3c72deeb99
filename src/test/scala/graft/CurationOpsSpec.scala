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

  test("near-dup stage drops fuzzy duplicates exact dedup cannot see") {
    import spark.implicits._
    // 6 shares 6 of 7 bigram shingles with 1 (jaccard 0.75) but differs
    // in the FIRST token, so the prefixLen=2 exact-dedup key cannot
    // catch it — only the minhash stage can. 2 is an exact dup of 1.
    val df = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (2L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (3L, "wwww xxxx yyyy zzzz awww bxxx cyyy dzzz"),
      (4L, "eeee ffff gggg hhhh iiii jjjj kkkk llll"),
      (5L, "mmmm nnnn"),
      (6L, "zzzz bbbb cccc dddd eeee ffff gggg hhhh"),
      (10L, "wwww xxxx yyyy zzzz awww bxxx cyyy dzzz"))
      .toDF("doc_id", "text")
    val rows = CurationOps.curationFunnel(df, "text", "doc_id",
      stopwords = Seq("the"), minTokens = 3, maxTokens = 50, minStops = 0,
      prefixLen = 2, w = 2, benchMod = 10,
      maxOverlapNum = 1, maxOverlapDen = 2, budget = 10L,
      ndMinJaccard = 0.5, ndBands = 8, ndR = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0L, "raw", 6L, 42L),
      (1L, "quality", 5L, 40L),
      (2L, "dedup", 4L, 32L),          // 2 (exact dup of 1) gone
      (3L, "neardup", 3L, 24L),        // 6 (fuzzy dup of 1) gone, keeper 1 stays
      (4L, "decontaminated", 2L, 16L), // 3 (== bench 10) gone
      (5L, "budget", 1L, 8L)))
  }

  test("disabling the near-dup stage reproduces the original 5-stage funnel") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (6L, "zzzz bbbb cccc dddd eeee ffff gggg hhhh"),
      (10L, "wwww xxxx yyyy zzzz awww bxxx cyyy dzzz"))
      .toDF("doc_id", "text")
    val rows = CurationOps.curationFunnel(df, "text", "doc_id",
      stopwords = Seq("the"), minTokens = 3, maxTokens = 50, minStops = 0,
      prefixLen = 2, w = 2, benchMod = 10,
      maxOverlapNum = 1, maxOverlapDen = 2, budget = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // no neardup row, original numbering, and the fuzzy dup SURVIVES
    assert(rows.toSeq == Seq(
      (0L, "raw", 2L), (1L, "quality", 2L), (2L, "dedup", 2L),
      (3L, "decontaminated", 2L), (4L, "budget", 2L)))
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

  test("shared stage memo: second funnel reuses stages 0-2, output equals the unshared form") {
    val key = "curationspec-shared-" + System.nanoTime() // unique per run
    def run(shared: Option[String], nd: Boolean) = CurationOps.curationFunnel(
      Tables.documents(spark, sf), "text", "doc_id",
      stopwords = graft.model.Defaults.config.stopwords,
      minTokens = 30, maxTokens = 1000, minStops = 3,
      prefixLen = 8, w = 3, benchMod = 20,
      maxOverlapNum = 1, maxOverlapDen = 2, budget = 4000L,
      ndMinJaccard = if (nd) 0.3 else 0.0, ndBands = if (nd) 8 else 0,
      sharedStageKey = shared)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val base = run(None, nd = false)
    val baseNd = run(None, nd = true)
    val hits0 = CurationOps.stageMemoHits.get()
    // first shared call builds the stages; the second (the q96-after-q71
    // bench shape) is a memo HIT and must produce the identical report
    assert(run(Some(key), nd = false) == base)
    assert(run(Some(key), nd = true) == baseNd)
    assert(CurationOps.stageMemoHits.get() >= hits0 + 1)
  }

  test("funnel stage memo: mutating the backing dir under a constant key recomputes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stale_")
      .toString + "/docs"
    val key = "curationspec-stale-" + System.nanoTime() // constant across BOTH calls
    def funnel(df: org.apache.spark.sql.DataFrame, shared: Option[String]) =
      CurationOps.curationFunnel(
        df, "text", "doc_id", stopwords = Seq("the"),
        minTokens = 2, maxTokens = 100, minStops = 0,
        prefixLen = 2, w = 3, benchMod = 20,
        maxOverlapNum = 1, maxOverlapDen = 1, budget = 1000L,
        sharedStageKey = shared)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    Seq((1L, "the alpha beta gamma delta"), (2L, "the alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val first = funnel(spark.read.parquet(dir), Some(key))
    // MUTATE the backing data under the SAME path and srcKey: the funnel
    // memo's content fingerprint (MemoFingerprint over sorted inputFiles)
    // must force a stage-prefix rebuild — a stale hit would replay the
    // old fixture's stage counts. Same structural-staleness proof the
    // Retrieval and Graph memo families carry.
    Seq((1L, "one two"), (2L, "three four"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val second = funnel(reread, Some(key))
    assert(second == funnel(reread, None),
      "post-mutation shared run must equal the unshared run on the new data")
    assert(second != first, "mutated fixture must change the funnel report")
  }

  test("splitLeakage: pair counts match an independent recount off the split assignment") {
    import spark.implicits._
    // many exact copies -> verified pairs at jaccard 1; ids spread so the
    // 50/50 hash split puts copies on both sides (leak rows expected)
    val copy = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = (1L to 40L).map(i => (i, copy)).toDF("doc_id", "text")
    val splits = Seq(("train", 1L), ("eval", 1L))
    val got = graft.ops.CurationOps.splitLeakage(df, "text", "doc_id",
      splits, den = 2L, w = 3, nBands = 8, r = 2, minJaccard = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // independent recount: all C(40,2) pairs are near-dups (exact copies),
    // so the expected matrix is a closed form of the per-split counts
    val assign = graft.ops.SampleOps.splitAssign(df, "doc_id", splits, den = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val nT = assign.values.count(_ == "train").toLong
    val nE = assign.values.count(_ == "eval").toLong
    assert(nT > 0 && nE > 0, "hash split should land docs on both sides")
    assert(got.getOrElse(("train", "train"), 0L) == nT * (nT - 1) / 2)
    assert(got.getOrElse(("eval", "eval"), 0L) == nE * (nE - 1) / 2)
    assert(got.getOrElse(("eval", "train"), 0L) == nT * nE, "cross-split leak rows")
    assert(got.values.sum == 40L * 39 / 2)
  }
}

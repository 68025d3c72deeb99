package graft

import graft.io.Tables
import graft.ops.SketchOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, sf)

  test("CMS never under-estimates, even with a deliberately collision-prone sketch") {
    // 2 rows x 16 buckets over the whole corpus vocabulary: collisions are
    // certain, under-counts must still be impossible
    val rows = SketchOps.cmsHeavyHitters(docs, "text", depth = 2, hexChars = 1, minEst = 1)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2)),
      "CMS estimate must be >= true count for every term")
  }

  test("CMS is exact when the sketch is wide enough for the vocabulary") {
    val rows = SketchOps.cmsHeavyHitters(docs, "text", depth = 3, hexChars = 4, minEst = 1)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) === r.getLong(2)),
      "3 x 65536 cells over a tiny vocabulary should not collide")
  }

  test("pigeonhole: >16 distinct terms in a 1x16 sketch must over-estimate somewhere") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, s"term$i")).toDF("id", "text")
    val rows = SketchOps.cmsHeavyHitters(df, "text", depth = 1, hexChars = 1, minEst = 1)
      .collect()
    assert(rows.length == 20, "every term estimate must reach minEst=1")
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)),
      "20 terms cannot occupy 16 buckets without a collision inflating an estimate")
  }

  test("sketches merge cell-wise: sketch(A union B) = sketch(A) + sketch(B)") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = SketchOps.countMinSketch(a, "text", depth = 2, hexChars = 2)
      .unionByName(SketchOps.countMinSketch(b, "text", depth = 2, hexChars = 2))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = SketchOps.countMinSketch(docs, "text", depth = 2, hexChars = 2)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    assert(whole.count() <= 2 * 16 * 16, "cell count bounded by depth * width")
  }

  test("the probe join broadcasts the constant-size sketch side") {
    val plan = SketchOps.cmsHeavyHitters(docs, "text", depth = 3, hexChars = 2, minEst = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch probe should be a broadcast hash join:\n$plan")
  }

  test("HLL register matches a hand-computed md5 rank for a one-term corpus") {
    import spark.implicits._
    val df = Seq((1L, "hello")).toDF("id", "text")
    val Array(row) = SketchOps.hllRegisters(df, "text", bucketHex = 2).collect()
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(h.substring(2, 17), 16)
    val expectedRho = if (v == 0) 61 else 61 - (64 - java.lang.Long.numberOfLeadingZeros(v))
    assert(row.getString(0) == h.substring(0, 2))
    assert(row.getLong(1) == expectedRho.toLong)
  }

  test("HLL registers are duplicate-insensitive and merge cell-wise by max") {
    import spark.implicits._
    val once = Seq((1L, "a b c d e")).toDF("id", "text")
    val thrice = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "e d c b a")).toDF("id", "text")
    assert(SketchOps.hllRegisters(once, "text", 2).collect().toSet ==
      SketchOps.hllRegisters(thrice, "text", 2).collect().toSet,
      "register file depends only on the distinct term set")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = SketchOps.hllRegisters(a, "text", 2)
      .unionByName(SketchOps.hllRegisters(b, "text", 2))
      .groupBy("bucket").agg(max("register").cast("long").as("register"))
    val whole = SketchOps.hllRegisters(docs, "text", 2)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "HLL(A union B) = cell-wise max of the shard sketches")
    assert(whole.count() <= 256, "register file bounded by 16^bucketHex")
  }

  test("per-group HLL registers roll up to the corpus register file by cell-wise max") {
    val by = SketchOps.hllRegistersBy(docs, "text", "lang", 2)
    val rolled = by.groupBy("bucket")
      .agg(max("register").cast("long").as("register"))
    val whole = SketchOps.hllRegisters(docs, "text", 2)
    assert(rolled.exceptAll(whole).isEmpty && whole.exceptAll(rolled).isEmpty,
      "max over the group axis must reproduce the corpus sketch")
  }

  test("log2 histogram buckets by bit length, stays bounded, merges by cell-wise add") {
    import spark.implicits._
    val df = Seq(0L, 1L, 1L, 2L, 3L, 4L, 7L, 8L, 1000L).toDF("m")
    val h = SketchOps.log2Histogram(df, "m")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0->b0; 1,1->b1; 2,3->b2; 4,7->b3; 8->b4; 1000(10 bits)->b10
    assert(h == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 10L -> 1L))
    // bounded regardless of input, merge = cell-wise add of shard sketches
    val a = Seq(5L, 6L).toDF("m"); val b = Seq(7L, 100L).toDF("m")
    val merged = SketchOps.log2Histogram(a.union(b), "m")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellAdd = (SketchOps.log2Histogram(a, "m").collect() ++
      SketchOps.log2Histogram(b, "m").collect())
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).sum }
    assert(merged == cellAdd)
  }

  test("log2 quantile probe brackets the exact nearest-rank quantile at every percent") {
    import spark.implicits._
    val values = (1L to 1000L).map(i => (i * 37) % 997 + 1)
    val df = values.toDF("m")
    val probes = SketchOps.log2QuantileProbe(df, "m", Seq(10, 50, 90, 99))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val sorted = values.sorted
    probes.foreach { case (p, (lo, hi)) =>
      val exact = sorted((math.ceil(p * sorted.length / 100.0).toLong - 1).toInt.max(0))
      assert(exact >= lo && exact <= hi,
        s"p$p: exact nearest-rank $exact outside sketch bucket [$lo, $hi]")
      assert(hi < 2 * lo.max(1) * 2, "factor-2 bucket width")
    }
  }

  test("HLL estimate lands within the expected error band of the true distinct count") {
    import spark.implicits._
    val n = 2000
    val df = (1 to n).map(i => (i.toLong, s"tok$i")).toDF("id", "text")
    val est = SketchOps.hllEstimate(SketchOps.hllRegisters(df, "text", 2), 2)
      .collect()(0).getDouble(0)
    // 256 buckets -> ~1.04/sqrt(256) = 6.5% standard error; allow 4 sigma
    assert(math.abs(est - n) / n < 0.26, s"estimate $est too far from $n")
  }

  /** Exact frequent-term answer the Misra-Gries route must reproduce:
    * terms whose w-gram count clears n/(k+1), via a plain full groupBy. */
  private def exactFrequent(
      df: org.apache.spark.sql.DataFrame, w: Int, k: Int): Set[(String, Long)] = {
    val counts = df.filter(col("text").isNotNull)
      .select(graft.functions.Generators.ngramExplode(col("text"), w).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = counts.map(_._2).sum
    counts.filter { case (_, c) => c * (k + 1) > n }.toSet
  }

  test("Misra-Gries frequent ngrams equals the exact answer with k far below the vocabulary") {
    import spark.implicits._
    // 60 distinct noise terms + two dominant ones; k=4 forces constant
    // eviction pressure in every partition, so the candidate guarantee —
    // not summary capacity — is what must carry the heavy terms through
    // n = 130, bound n/(k+1) = 26: alpha (40) and beta (30) clear it,
    // every noise term (1 each) does not
    val rows = (1 to 60).map(i => (i.toLong, s"noise$i")) ++
      (1 to 40).map(i => (100L + i, "alpha")) ++
      (1 to 30).map(i => (200L + i, "beta"))
    val df = rows.toDF("id", "text")
    val got = SketchOps.frequentNgrams(df, "text", w = 1, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === exactFrequent(df, 1, 4))
    assert(got.map(_._1) === Set("alpha", "beta"))
  }

  test("Misra-Gries output is partitioning-independent and carries exact ppm shares") {
    val base = docs
    val p1 = SketchOps.frequentNgrams(base.repartition(1), "text", w = 2, k = 50)
      .collect().toSeq
    val p7 = SketchOps.frequentNgrams(base.repartition(7), "text", w = 2, k = 50)
      .collect().toSeq
    assert(p1 === p7, "candidate superset guarantee must make the output deterministic")
    p1.foreach { r =>
      assert(r.getLong(2) >= 1000000L / 51,
        s"${r.getString(0)}: share ${r.getLong(2)} ppm below the n/(k+1) bound")
    }
  }

  test("per-group Misra-Gries finds a group-local flood the global table misses") {
    import spark.implicits._
    // "spam" floods g1 (30 of its 60 tokens) but is 30/1090 of the corpus:
    // per-group with k=4 it must surface in g1; globally at k=4 it would
    // need > 1090/5 = 218 occurrences
    val rows = (1 to 30).map(i => (i.toLong, "spam", "g1")) ++
      (1 to 30).map(i => (100L + i, s"one$i", "g1")) ++
      (1 to 1030).map(i => (10000L + i, s"div${i % 515}", "g2"))
    val df = rows.toDF("id", "text", "src")
    val got = SketchOps.frequentNgramsByGroup(df, "text", "src", w = 1, k = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // g1: spam 30/60 (share 500000 ppm, bound 60/5=12); one* (1 each) stay out
    assert(got.toSeq == Seq(("g1", "spam", 30L, 500000L)))
    // the global sketch at the same k misses it
    val global = SketchOps.frequentNgrams(df, "text", w = 1, k = 4)
      .collect().map(_.getString(0)).toSet
    assert(!global.contains("spam"))
    // partitioning-independence: the superset guarantee holds group-wise
    val p7 = SketchOps.frequentNgramsByGroup(df.repartition(7), "text", "src", w = 1, k = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == p7.toSeq)
  }

  test("Misra-Gries exact pass joins a broadcast candidate set (no vocabulary shuffle)") {
    val plan = SketchOps.frequentNgrams(docs, "text", w = 2, k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast candidate join in:\n$plan")
  }

  test("hllOverlap: identical vocabularies estimate jaccard 1, union = each side") {
    import spark.implicits._
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val df = Seq(("a", text), ("b", text)).toDF("src", "text")
    val Array(r) = SketchOps.hllOverlap(df, "text", "src", bucketHex = 2).collect()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    val (ea, eb, eu, ei, j) = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6))
    assert(ea == eb && ea == eu, "same register file on every side")
    assert(ei == ea, "inclusion-exclusion must return the common estimate")
    assert(j == 1.0)
  }

  test("hllOverlap: a 10-of-30 shared vocabulary lands near the true overlap") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"s$i")
    val df = Seq(
      ("a", (shared ++ (0 until 10).map(i => s"a$i")).mkString(" ")),
      ("b", (shared ++ (0 until 10).map(i => s"b$i")).mkString(" "))).toDF("src", "text")
    val Array(r) = SketchOps.hllOverlap(df, "text", "src", bucketHex = 2).collect()
    // 30 distinct in a 256-bucket sketch: linear-counting regime, tight
    assert(math.abs(r.getDouble(4) - 30.0) < 5.0, s"union est ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 10.0) < 5.0, s"intersection est ${r.getDouble(5)}")
    assert(r.getDouble(6) > 0.15 && r.getDouble(6) < 0.55, s"jaccard ${r.getDouble(6)}")
  }

  test("hllOverlap: disjoint vocabularies clamp the intersection at >= 0") {
    import spark.implicits._
    val df = Seq(
      ("a", (0 until 15).map(i => s"a$i").mkString(" ")),
      ("b", (0 until 15).map(i => s"b$i").mkString(" ")),
      ("c", (0 until 15).map(i => s"c$i").mkString(" "))).toDF("src", "text")
    val rows = SketchOps.hllOverlap(df, "text", "src", bucketHex = 2).collect()
    assert(rows.length == 3, "3 sources -> 3 unordered pairs")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered a < b")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(6) >= 0.0)
      assert(r.getDouble(4) >= math.max(r.getDouble(2), r.getDouble(3)) - 1e-9,
        "union estimate can never fall below a side")
      assert(r.getDouble(5) < 6.0, s"disjoint 15+15 should estimate near 0: ${r.getDouble(5)}")
    }
  }
}

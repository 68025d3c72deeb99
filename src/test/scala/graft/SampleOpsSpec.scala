package graft

import graft.ops.SampleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling: threshold exactness, nesting, partition
  * independence, per-group quotas. */
class SampleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ids(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
  }

  test("hexThreshold is exact integer arithmetic") {
    assert(SampleOps.hexThreshold(1, 2) == "80000000")
    assert(SampleOps.hexThreshold(7, 10) == "b3333333")
    assert(SampleOps.hexThreshold(0, 10) == "00000000")
    intercept[IllegalArgumentException](SampleOps.hexThreshold(3, 2))
  }

  test("hashSample hits the requested fraction within Bernoulli tolerance") {
    val n = 4000
    val kept = SampleOps.hashSample(ids(n), "id", 3, 10).count()
    // 3 sigma for Binomial(4000, 0.3) is ~87
    assert(math.abs(kept - 1200L) < 150, s"kept $kept of $n at 3/10")
  }

  test("samples nest: the 1/10 sample is a strict subset of the 5/10 sample") {
    val df = ids(2000)
    val small = SampleOps.hashSample(df, "id", 1, 10).select("id").collect().map(_.getLong(0)).toSet
    val large = SampleOps.hashSample(df, "id", 5, 10).select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large) && small.nonEmpty && small.size < large.size)
  }

  test("sampling and quotas are invariant under repartitioning") {
    val df = ids(1000)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSet
    assert(key(SampleOps.hashSample(df, "id", 3, 10)) ==
      key(SampleOps.hashSample(df.repartition(17), "id", 3, 10)))
    assert(key(SampleOps.stratifiedQuota(df, "grp", "id", 7)) ==
      key(SampleOps.stratifiedQuota(df.repartition(17), "grp", "id", 7)))
  }

  test("stratifiedQuota caps every group at n with dense ranks from 1") {
    val out = SampleOps.stratifiedQuota(ids(1000), "grp", "id", 7)
    val perGroup = out.groupBy("grp")
      .agg(count(lit(1)).as("c"), min("rk").as("lo"), max("rk").as("hi"))
      .collect()
    assert(perGroup.length == 5)
    perGroup.foreach { r =>
      assert(r.getLong(1) == 7 && r.getLong(2) == 1L && r.getLong(3) == 7L)
    }
    // quota of a group smaller than n keeps the whole group
    val tiny = SampleOps.stratifiedQuota(ids(3), "grp", "id", 7)
    assert(tiny.count() == 3)
  }

  test("packSequences: start-offset bins reproduce a driver-side replay, bounded per-bin mass") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, (i % 37) + 3)).toDF("id", "toks")
    val budget = 50L
    val out = SampleOps.packSequences(df, "id", "toks", budget, nBuckets = 4)
      .select("bucket", "bin", "id", "toks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replay: same md5 order per bucket, sequential offset division
    def hex8(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    }
    val expected = out.groupBy(_._1).toSeq.flatMap { case (bucket, rows) =>
      var cum = 0L
      rows.sortBy(r => (hex8(r._3), r._3)).toSeq.map { case (_, _, id, toks) =>
        val bin = cum / budget
        cum += toks
        (bucket, id) -> bin
      }
    }.toMap
    out.foreach { case (bucket, bin, id, _) =>
      assert(expected((bucket, id)) == bin, s"doc $id in bucket $bucket: bin $bin")
    }
    // buckets are md5-spread: all 4 used; every bucket's hex8 assignment matches
    assert(out.map(_._1).distinct.length == 4)
    // concatenation model: a bin's token mass is < budget + its last doc
    val mass = out.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._4).sum)
    val maxDoc = 39L
    mass.foreach { case (k, m) => assert(m < budget + maxDoc, s"bin $k mass $m") }
  }

  test("weightedMix applies each group's own fraction and drops unlisted groups") {
    val df = ids(2000) // groups g0..g4, 400 rows each
    val mix = SampleOps.weightedMix(df, "grp", "id",
      Map("g0" -> ((1L, 1L)), "g1" -> ((1L, 2L)), "g2" -> ((0L, 5L))))
    val counts = mix.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("g0", "g1")) // g2 sampled to 0, g3/g4 unlisted
    assert(counts("g0") == 400L) // full keep
    assert(math.abs(counts("g1") - 200L) < 60) // ~1/2 of 400
    // per-group selection is hashSample's: same rows as sampling g1 alone
    val direct = SampleOps.hashSample(df.filter(col("grp") === "g1"), "id", 1, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val mixed = mix.filter(col("grp") === "g1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mixed == direct)
  }

  test("pre-filtering with hashSample does not change the quota result when groups stay >= n") {
    val df = ids(1000)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = key(SampleOps.stratifiedQuota(df, "grp", "id", 5))
    val prefiltered = key(SampleOps.stratifiedQuota(
      SampleOps.hashSample(df, "id", 5, 10), "grp", "id", 5))
    assert(direct == prefiltered)
  }

  private def toked(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i => (i, i % 7 + 1)).toDF("id", "toks")
  }

  test("budgetSample equals the naive global-window form") {
    import spark.implicits._
    val df = toked(500)
    // naive: one global cumulative window over (md5, key)
    val hk = substring(md5(col("id").cast("string")), 1, 8)
    val naive = df
      .withColumn("cum", sum(col("toks")).over(
        org.apache.spark.sql.expressions.Window.orderBy(hk.asc, col("id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("cum") <= 400)
      .select("id", "cum").as[(Long, Long)].collect().toSet
    val bucketed = SampleOps.budgetSample(df, "id", "toks", budget = 400, bucketHex = 1)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toSet
    assert(naive == bucketed,
      "bucket-offset decomposition must reproduce the global running sum exactly")
  }

  test("budgetSample is a take-while: inclusive totals within budget, next row would exceed") {
    val out = SampleOps.budgetSample(toked(500), "id", "toks", budget = 400)
      .orderBy(col("cum_tokens").desc).collect()
    assert(out.nonEmpty)
    val last = out.head.getAs[Long]("cum_tokens")
    assert(last <= 400)
    // the corpus has more tokens than the budget, so the selection stopped
    // strictly short of the total
    assert(last > 400 - 8, "the first dropped row (<= 7 tokens) would have exceeded the budget")
  }

  test("budget ladders nest: a smaller budget selects a subset of a larger one") {
    import spark.implicits._
    val df = toked(300)
    def sel(b: Long) = SampleOps.budgetSample(df, "id", "toks", b)
      .select("id").as[Long].collect().toSet
    val small = sel(200)
    val large = sel(800)
    assert(small.nonEmpty && small.size < large.size && small.subsetOf(large))
  }

  test("tieredMix: nearest-rank cuts assign tiers, each tier samples at its own fraction") {
    import spark.implicits._
    // metric = id over 1..100: p50 bound = 50, p90 bound = 90 (n=100, all
    // distinct) -> tiers: 1..50 -> 0, 51..90 -> 1, 91..100 -> 2
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "m")
    val full = SampleOps.tieredMix(df, "m", "id",
      cuts = Seq(50, 90), fractions = Seq((1L, 1L), (1L, 1L), (1L, 1L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("tier")).toMap
    assert(full.size == 100, "full fractions keep every row")
    assert(full(50L) == 0L && full(51L) == 1L, "p50 bound is inclusive below")
    assert(full(90L) == 1L && full(91L) == 2L, "p90 bound is inclusive below")
    // fractional tiers: each tier's survivors are exactly hashSample of
    // that tier's rows — the shared-threshold consistency contract
    val mixed = SampleOps.tieredMix(df, "m", "id",
      cuts = Seq(50, 90), fractions = Seq((1L, 4L), (1L, 2L), (1L, 1L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("tier"))
    val tier0 = df.filter(col("m") <= 50)
    val want0 = SampleOps.hashSample(tier0, "id", 1L, 4L)
      .collect().map(_.getLong(0)).toSet
    assert(mixed.filter(_._2 == 0L).map(_._1).toSet == want0)
    assert(mixed.count(_._2 == 2L) == 10, "top tier keeps all 10 rows")
  }

  test("tieredMix: raising one tier's fraction only adds rows of that tier") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "m")
    def run(f0: (Long, Long)) = SampleOps.tieredMix(df, "m", "id",
      cuts = Seq(50, 90), fractions = Seq(f0, (1L, 2L), (1L, 1L)))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("tier"))).toSet
    val small = run((1L, 4L)); val big = run((1L, 2L))
    assert(small.subsetOf(big))
    assert((big -- small).forall(_._2 == 0L))
  }

  test("splitAssign partitions the corpus: disjoint, exhaustive, near-target shares") {
    val df = ids(4000)
    val out = SampleOps.splitAssign(df, "id",
      Seq(("train", 90L), ("val", 5L), ("test", 5L)), den = 100L)
    assert(out.count() == 4000L)
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS.values.sum == 4000L)
    // 3 sigma for Binomial(4000, 0.05) is ~41
    assert(math.abs(byS("val") - 200L) < 70 && math.abs(byS("test") - 200L) < 70, byS)
  }

  test("splitAssign membership is stable under corpus growth") {
    def assign(n: Int) = SampleOps.splitAssign(ids(n), "id",
        Seq(("train", 90L), ("val", 5L), ("test", 5L)), den = 100L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val small = assign(500); val big = assign(2000)
    // every original row keeps its split when 3x new data arrives
    small.foreach { case (id, s) => assert(big(id) == s, s"row $id moved") }
  }

  test("splitAssign boundary shift only moves rows across the shifted boundary") {
    def assign(trainShare: Long) = SampleOps.splitAssign(ids(2000), "id",
        Seq(("train", trainShare), ("val", 95L - trainShare), ("test", 5L)), den = 100L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val before = assign(80L); val after = assign(90L)
    before.foreach { case (id, s) =>
      // growing train eats only from val; test membership is untouched
      if (s != after(id)) assert(s == "val" && after(id) == "train", s"row $id: $s -> ${after(id)}")
      if (s == "test") assert(after(id) == "test")
    }
  }

  test("splitAssign is map-only: no exchange in the plan") {
    val plan = SampleOps.splitAssign(ids(100), "id",
      Seq(("a", 1L), ("b", 1L)), den = 2L).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("budgetSample's corpus window shards by bucket, not a single global sort") {
    val plan = SampleOps.budgetSample(toked(100), "id", "toks", budget = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bkt"),
      s"expected the per-bucket window exchange:\n${plan.take(800)}")
  }

  // sources of size 100 / 400 / 900: n_min = 100, so the exact isqrt
  // weights are 100 / 200 / 300 and the keep rates 1, 1/2, 1/3
  private def skewed = {
    import spark.implicits._
    ((1L to 100L).map(i => (i, "small")) ++
      (101L to 500L).map(i => (i, "mid")) ++
      (501L to 1400L).map(i => (i, "big"))).toDF("id", "src")
  }

  test("temperatureWeights: exact isqrt(n_min*n) numerators from the data") {
    val wt = SampleOps.temperatureWeights(skewed, "src")
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Long]("w_num"))).toMap
    assert(wt == Map("small" -> (100L, 100L), "mid" -> (400L, 200L), "big" -> (900L, 300L)))
  }

  test("temperatureMix keeps the smallest source whole and matches the exact integer test") {
    val kept = SampleOps.temperatureMix(skewed, "src", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert((1L to 100L).forall(kept)) // rate 1: every small-source row survives
    // recompute the keep predicate independently in the JVM
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = ((1L to 100L).filter(i => h32(i) * 100L < 100L * (1L << 32)) ++
      (101L to 500L).filter(i => h32(i) * 400L < 200L * (1L << 32)) ++
      (501L to 1400L).filter(i => h32(i) * 900L < 300L * (1L << 32))).toSet
    assert(kept == expect)
    // and the realized rates sit near sqrt(n_min/n): ~1, ~1/2, ~1/3
    val mid = kept.count(i => i > 100 && i <= 500)
    val big = kept.count(_ > 500)
    assert(math.abs(mid - 200) < 60, s"mid kept $mid of 400 at rate 1/2")
    assert(math.abs(big - 300) < 70, s"big kept $big of 900 at rate 1/3")
  }

  test("temperatureMix is invariant under repartitioning and profile counts agree") {
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSet
    assert(key(SampleOps.temperatureMix(skewed, "src", "id")) ==
      key(SampleOps.temperatureMix(skewed.repartition(13), "src", "id")))
    val prof = SampleOps.temperatureMixProfile(skewed, "src", "id")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    val byGroup = SampleOps.temperatureMix(skewed, "src", "id")
      .groupBy("src").count()
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Long]("count")).toMap
    assert(prof == byGroup)
  }

  test("mix plan: quotas, capped keep rates, and loud missing-source deficits") {
    import spark.implicits._
    val docs = Seq(
      ("a", "one two three four"), ("a", "five six"), // a: 6 tokens
      ("b", "just two")) // b: 2 tokens
      .map { case (s, t) => (s, t) }.toDF("src", "text")
    // budget 8, weights a:3, b:1, ghost:4 (sum 8) ->
    //   a: target 3, avail 6 -> keep 500000 ppm, yield 3, deficit 0
    //   b: target 1, avail 2 -> keep 500000 ppm, yield 1, deficit 0
    //   ghost: target 4, avail 0 -> keep 0, yield 0, deficit 4
    val r = SampleOps.mixPlan(docs, "text", "src",
        Seq(("a", 3L), ("b", 1L), ("ghost", 4L)), budgetTokens = 8L)
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    assert(r("a") == (6L, 3L, 500000L, 3L, 0L))
    assert(r("b") == (2L, 1L, 500000L, 1L, 0L))
    assert(r("ghost") == (0L, 4L, 0L, 0L, 4L))
    // quota exceeding availability caps the keep rate at 10^6
    val r2 = SampleOps.mixPlan(docs, "text", "src",
        Seq(("b", 1L)), budgetTokens = 100L)
      .collect()(0)
    assert(r2.getAs[Long]("keep_ppm") == 1000000L &&
      r2.getAs[Long]("expected_tokens") == 2L &&
      r2.getAs[Long]("deficit_tokens") == 98L)
    intercept[IllegalArgumentException] {
      SampleOps.mixPlan(docs, "text", "src", Seq(("a", 1L), ("a", 2L)), 10L)
    }
  }

  test("truncation waste: hand-computed kept/truncated/pad split per window") {
    import spark.implicits._
    val docs = Seq(
      ("a", "t1 t2 t3"),             // 3 tokens
      ("a", "t1 t2 t3 t4 t5"),       // 5 tokens
      ("b", "solo"))                 // 1 token
      .toDF("src", "text")
    val r = SampleOps.truncationWaste(docs, "text", "src", windows = Seq(2, 4))
      .collect()
      .map(x => (x.getLong(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
      .toMap
    // W=2, a: kept = 2+2 = 4, trunc = 1+3 = 4, pad = 2*2-4 = 0, util = 10^6
    assert(r((2L, "a")) == (2L, 8L, 4L, 4L, 0L, 1000000L))
    // W=2, b: kept 1, trunc 0, pad 1, util 500000
    assert(r((2L, "b")) == (1L, 1L, 1L, 0L, 1L, 500000L))
    // W=4, a: kept = 3+4 = 7, trunc = 0+1 = 1, pad = 8-7 = 1, util = 875000
    assert(r((4L, "a")) == (2L, 8L, 7L, 1L, 1L, 875000L))
    // W=4, b: kept 1, pad 3, util 250000
    assert(r((4L, "b")) == (1L, 1L, 1L, 0L, 3L, 250000L))
    intercept[IllegalArgumentException] {
      SampleOps.truncationWaste(docs, "text", "src", Seq(4, 4))
    }
  }

  test("weightedPrioritySample: heavy weights dominate, nested in n, formula JVM-recomputable") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, 10L)) :+ (1000L, 1000000000L))
      .toDF("doc_id", "n_chars")
    val top = SampleOps.weightedPrioritySample(df, "doc_id", "n_chars", 20).collect()
    // the 10^9-weight row has priority ln(u)/10^9 ~ 0 micro: it must lead
    assert(top.head.getLong(0) == 1000L)
    assert(top.head.getAs[Long]("priority_micro") == 0L)
    // nested: top-10 is a prefix of top-20 (same total order)
    val top10 = SampleOps.weightedPrioritySample(df, "doc_id", "n_chars", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(top.map(_.getLong(0)).take(10).toSeq == top10)
    // JVM recomputation of one row pins the md5-uniform + micro-ln formula
    val k = top(1).getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(k.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    val expect = math.round(math.log(u) / 10L * 1e6)
    assert(top(1).getAs[Long]("priority_micro") == expect)
    // weight <= 0 and null weights drop
    val bad = Seq((1L, 0L), (2L, -5L)).toDF("doc_id", "n_chars")
    assert(SampleOps.weightedPrioritySample(bad, "doc_id", "n_chars", 5).count() == 0)
  }
}

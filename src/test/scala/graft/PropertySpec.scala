package graft

import graft.functions.{KeywordMatch, TextHash}
import graft.model.Defaults
import graft.ops.{DedupOps, KeywordOps, ResampleOps, StatsOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.2): engine semantics that must hold
  * for ANY input, not just the fixtures. Uses scalacheck generators with
  * fixed seeds directly (scalatestplus bridge is not in the offline cache);
  * each property is checked over `Trials` deterministic samples. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Trials = 10

  /** Deterministic samples of `gen`, seeds 0..Trials-1. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (0 until Trials).foreach { i =>
      body(gen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator returned no sample for seed $i")))
    }

  private val word = Gen.oneOf(
    "join", "merge", "hash", "scan", "filter", "table", "stream", "window",
    "batch", "column", "row", "sort", "vector", "query", "group",
    "noise", "pad", "lorem", "ipsum", "alpha")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, textGen))

  test("property: AVI container round trip is identity for any frame geometry") {
    import graft.ops.MultimodalOps
    val videoGen = for {
      w <- Gen.chooseNum(1, 23)   // crosses every rowBytes padding residue
      h <- Gen.chooseNum(1, 9)
      fps <- Gen.chooseNum(1, 60)
      nf <- Gen.chooseNum(1, 7)
      pix <- Gen.listOfN(nf * w * h, Gen.chooseNum(0, 0xffffff))
    } yield (w, h, fps, pix.grouped(w * h).map(_.toArray).toSeq)
    forAll(videoGen) { case (w, h, fps, frames) =>
      val avi = MultimodalOps.encodeAvi(w, h, fps, frames)
      val dec = MultimodalOps.decodeAvi(avi).getOrElse(
        fail(s"decode failed for ${w}x$h@$fps x${frames.length}"))
      assert(dec.width == w && dec.height == h && dec.fps == fps)
      assert(dec.frames.length == frames.length)
      dec.frames.zip(frames).foreach { case (d, s) => assert(d.toSeq == s.toSeq) }
      // and the container itself is a fixed point: encode(decode(x)) == x
      assert(MultimodalOps.encodeAvi(
        dec.width, dec.height, dec.fps, dec.frames.toSeq).toSeq == avi.toSeq)
    }
  }

  test("property: tag labels always come from the taxonomy, in taxonomy order") {
    val tax = Defaults.taxonomy
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val tags = texts.toDF("text")
        .select(KeywordMatch.multiKeywordTags(col("text"), tax.industries).as("t"))
        .collect().map(_.getSeq[String](0))
      tags.foreach { t =>
        assert(t.forall(tax.industryNames.contains))
        assert(t == tax.industryNames.filter(t.contains)) // taxonomy order
      }
    }
  }

  test("property: per-industry counts are invariant under row order and partitioning") {
    val cfg = Defaults.config
    forAll(corpusGen) { texts =>
      import spark.implicits._
      // channel "c$i" never collides with cfg.channelBlacklist (src7/SRC13),
      // so reshuffled row indices cannot change which rows survive cleaning
      def counts(ts: Seq[String], parts: Int) = StatsOps.industryCounts(
        KeywordOps.cleanExploded(
          ts.zipWithIndex.map { case (t, i) => (i.toLong, t, s"c$i", 1L) }
            .toDF("doc_id", "text", "source", "n_chars").repartition(parts), cfg))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(counts(texts, 1) == counts(scala.util.Random.shuffle(texts), 7))
    }
  }

  test("property: top-K posts is a prefix of the full ordering") {
    val cfg = Defaults.config
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, s"src$i", (i * 37 % 11).toLong) }
        .toDF("doc_id", "text", "source", "n_chars")
      val exploded = KeywordOps.cleanExploded(df, cfg)
      val k3 = StatsOps.topPostsPerIndustry(exploded, cfg, 3)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val kAll = StatsOps.topPostsPerIndustry(exploded, cfg, Int.MaxValue)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val byInd = kAll.groupBy(_._1)
      k3.groupBy(_._1).foreach { case (ind, rows) =>
        assert(rows.toSeq == byInd(ind).take(rows.length).toSeq)
      }
    }
  }

  test("property: resample buckets sum to the total row count (zero-fill adds only zeros)") {
    val tsGen = Gen.chooseNum(0L, 90L * 24 * 3600).map(s => new java.sql.Timestamp(s * 1000))
    forAll(Gen.nonEmptyListOf(tsGen)) { tss =>
      import spark.implicits._
      val df = tss.map(Tuple1(_)).toDF("ts")
      val out = ResampleOps.resampleCount(df, "ts", ResampleOps.Daily).collect()
      assert(out.map(_.getLong(1)).sum == tss.length)
    }
  }

  test("property: minhash signature has k components in [0, 2^31-1)") {
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // signatures via the public pair pipeline's building blocks
      val sig = docs.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          graft.functions.Generators.shingleExplode(col("text"), 2).as("s"))
        .select(col("doc_id"), TextHash.hash28(col("s")).as("h"))
        .groupBy("doc_id")
        .agg(min(TextHash.minhashMember(0, col("h"))).as("m0"),
          min(TextHash.minhashMember(7, col("h"))).as("m7"))
        .collect()
      sig.foreach { r =>
        Seq(r.getLong(1), r.getLong(2)).foreach(v =>
          assert(v >= 0 && v < TextHash.MinHashP))
      }
    }
  }

  test("property: fused simhash kernel matches the HOF reference formulation") {
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val df = texts.filter(_.trim.nonEmpty).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      if (df.count() > 0) {
        val both = df
          .select(col("id"),
            TextHash.simhash(TextHash.tokenSet(col("t"))).as("fused"),
            TextHash.simhashHof(TextHash.tokenSet(col("t"))).as("hof"))
          .collect()
        both.foreach(r => assert(r.getLong(1) == r.getLong(2),
          s"kernel/HOF simhash diverge for id ${r.getLong(0)}"))
      }
    }
  }

  test("property: fused l2 kernel is bit-identical to the HOF formulation") {
    val vecGen = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 7.0f)).flatMap(a =>
        Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 7.0f)).map(b => (a, b))))
    forAll(Gen.nonEmptyListOf(vecGen)) { pairs =>
      import spark.implicits._
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
        .toDF("id", "a", "b")
      val hof = aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      df.select(col("id"),
          graft.functions.VectorMath.l2Squared(col("a"), col("b")).as("fused"),
          round(hof, 6).as("ref"))
        .collect()
        .foreach(r => assert(r.getDouble(1) == r.getDouble(2),
          s"kernel/HOF l2 diverge for id ${r.getLong(0)}"))
    }
  }

  test("property: exact dedup keeps exactly one row per key, the minimum id") {
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val out = DedupOps.exactDedup(df, "t", "id").collect()
      val expect = texts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .groupBy(_._1).map { case (t, rows) => t -> rows.map(_._2).min }
      assert(out.length == expect.size)
      out.foreach(r => assert(expect(r.getString(1)) == r.getLong(0)))
    }
  }
}

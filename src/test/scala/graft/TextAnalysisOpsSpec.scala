package graft

import graft.io.Tables
import graft.ops.TextAnalysisOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, sf)

  test("pooled perceptron separates a disjoint-vocabulary training set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // positive docs speak {aaaa,bbbb}, negative docs {cccc,dddd} —
    // linearly separable unless two of the four tokens hash-collide at
    // dim=512 (deterministic md5 map: if this passes once it always does)
    val df = Seq(
      (1L, "aaaa bbbb aaaa"), (2L, "bbbb aaaa"), (3L, "aaaa aaaa"),
      (10L, "cccc dddd"), (11L, "dddd dddd cccc"), (12L, "cccc"))
      .toDF("doc_id", "text")
    val w = TextAnalysisOps.perceptronTrain(
      df, "text", "doc_id", labelExpr = col("doc_id") < 10L, dim = 512, epochs = 5)
    assert(w.count() == 512)
    // score every training doc with the learned weights: the separable
    // set must be fully classified after pooled epochs
    val fIdx = pmod(conv(substring(md5(col("term")), 1, 7), 16, 10).cast("long"), lit(512))
    val scores = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"), fIdx.as("f"))
      .join(w, "f")
      .groupBy("doc_id").agg(sum(col("weight")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 3L).foreach(id => assert(scores(id) > 0, s"doc $id must score positive: $scores"))
    Seq(10L, 11L, 12L).foreach(id => assert(scores(id) <= 0, s"doc $id must score non-positive: $scores"))
    // all-zero weights on an empty corpus: training nothing is explicit
    val w0 = TextAnalysisOps.perceptronTrain(
      df.filter(col("doc_id") < 0), "text", "doc_id", col("doc_id") < 10L, dim = 8, epochs = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(w0 == Seq.fill(8)(0L))
  }

  test("langid confusion matrix counts every document exactly once") {
    val rows = TextAnalysisOps.langIdConfusion(docs, "text", "lang", "doc_id").collect()
    assert(rows.map(_.getLong(2)).sum == docs.count())
  }

  test("langid argmax tiebreak is deterministic") {
    import spark.implicits._
    // no markers at all -> every candidate scores 0 -> first lang wins
    val df = Seq((1L, "zzz yyy xxx", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalysisOps.langIdConfusion(df, "text", "lang", "doc_id").collect()
    assert(out.head.getString(1) == TextAnalysisOps.langProfiles.head._1)
  }

  test("quality profile ratios are in [0,1] and score is bounded") {
    val rows = TextAnalysisOps
      .qualityProfile(docs, "text", "doc_id", sampleMod = 5, stopwords = Seq("the", "a"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val digit = r.getAs[Double]("digit_ratio")
      val stop = r.getAs[Double]("stopword_ratio")
      val score = r.getAs[Double]("quality_score")
      assert(digit >= 0 && digit <= 1); assert(stop >= 0 && stop <= 1)
      assert(score >= 0 && score <= 1.000001)
    }
  }

  test("token stats: bpe tokenization of clean lowercase text equals ws tokenization") {
    val r = TextAnalysisOps.tokenStats(docs, "text").collect().head
    assert(r.getAs[Long]("n_docs") == docs.count())
    // synthetic corpus is pure lowercase+spaces: the two tokenizers agree
    assert(r.getAs[Long]("total_ws_tokens") == r.getAs[Long]("total_bpe_tokens"))
  }

  test("A6 dynamic stopwords: channel names disappear from word counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val posts = Seq(
      (1L, "TechDaily covers alpha news", "TechDaily", 5L),
      (2L, "alpha beats techdaily again", "TechDaily", 6L))
      .toDF("doc_id", "text", "source", "n_chars")
    val cfg = graft.model.Defaults.config
    val augmented = graft.text.TextOps.augmentStopwordsWithChannels(posts, "source", cfg)
    val words = graft.text.TextOps.wordFrequency(posts, "text", augmented, 50)
      .collect().map(_.getString(0)).toSet
    assert(!words.contains("techdaily"), "channel self-mentions must be stopworded")
    assert(words.contains("alpha"))
    // static stopwords survive the augmentation
    assert(cfg.stopwords.forall(s => !words.contains(s)))
  }

  test("repetition profile: hand-computed bigram ratios, multiset not distinct") {
    import spark.implicits._
    val df = Seq(
      // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> n=5, top=3 (a b), dup=5
      (1L, "a b a b a b"),
      // all-distinct bigrams: top ratio 1/3, dup 0
      (2L, "w x y z"),
      // one token -> no bigrams -> absent
      (3L, "solo"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.repetitionProfile(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((5L, 0.6, 1.0)))
    assert(out(2L) == ((3L, 0.333333, 0.0)))
  }

  test("repetition profile flags the repetitive corpus doc above the clean one") {
    val prof = TextAnalysisOps.repetitionProfile(docs, "text", "doc_id")
    assert(prof.count() > 0)
    val r = prof.agg(org.apache.spark.sql.functions.max("dup_bigram_ratio"),
      org.apache.spark.sql.functions.min("dup_bigram_ratio")).head
    assert(r.getDouble(0) >= r.getDouble(1) && r.getDouble(0) <= 1.0 && r.getDouble(1) >= 0.0)
  }

  test("tf-idf: corpus-wide terms score below rare ones, k caps each doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat"),      // "the" in every doc (df=3), cat/sat rare
      (2L, "the dog ran ran"),  // tf boosts "ran"
      (3L, "the bird"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.tfIdfTopTerms(df, "text", "doc_id", k = 2).collect()
    // every doc capped at k
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2))
    val doc1 = out.filter(_.getLong(0) == 1L).map(r => (r.getString(2), r.getDouble(5)))
    // rare terms (idf = 3/1) outrank the ubiquitous "the" (idf = 3/3)
    assert(doc1.map(_._1).toSet == Set("cat", "sat"))
    assert(doc1.forall(_._2 == 3.0)) // tf=1 * n=3 / df=1
    // doc 2's top term is "ran": tf=2 * 3 / 1 = 6
    val top2 = out.filter(r => r.getLong(0) == 2L && r.getLong(1) == 1L).head
    assert(top2.getString(2) == "ran" && top2.getDouble(5) == 6.0)
  }

  test("gopher rule mask: each bit fires on exactly its own violation") {
    import spark.implicits._
    val df = Seq(
      // clean: 6 tokens in [3,6], mean len 21/6 in [3,10], has a stopword,
      // 5 distinct bigrams (top 1/5 = 20%, not > 20%), none duplicated
      (1L, "the cats sat onto mats now"),
      // repetition: mean len 2 < 3 (bit 2), no stopword (bit 4),
      // top bigram "go go" is 5/5 (bit 8), all 5 occurrences dup'd (bit 16)
      (2L, "go go go go go go"),
      // short: 1 token < 3 (bit 1), mean 2 < 3 (bit 2), no stopword (bit 4),
      // no bigrams at all -> bits 8/16 must stay clear
      (3L, "hi"),
      (4L, null.asInstanceOf[String]),
      // numeric tokens: 3/6 alphabetic < 80% (bit 32); token/len/stop
      // rules pass (6 tokens in [3,6], mean len 3 in [3,10], has "the");
      // bigrams "123 the" x3 + "the 123" x2 -> top 3*5 > 5 (bit 8), all 5
      // occurrences duplicated -> 5*5 > 5*2 (bit 16)
      (5L, "123 the 123 the 123 the"),
      // symbol tokens: 2 '#' of 6 tokens -> 10*2 > 6 (bit 64); alpha 4/6
      // < 80% (bit 32); mean len 16/6 < 3 (bit 2); top bigram "# the" x2
      // of 5 -> 2*5 > 5 (bit 8); dup 2 of 5 -> 2*5 = 5*2 NOT strictly
      // over -> bit 16 stays clear (exactly-at-threshold)
      (6L, "# the cats # the mats"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps
      .gopherRuleProfile(df, "text", "doc_id", stopwords = Seq("the"),
        minTokens = 3, maxTokens = 6, minStops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 7L -> 1L, 30L -> 1L,
      8L + 16L + 32L -> 1L, 2L + 8L + 32L + 64L -> 1L), s"got $out")
  }

  test("fingerprints are order-sensitive") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val fps = TextAnalysisOps.fingerprints(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(3L))
    assert(fps(1L) != fps(2L))
    fps.values.foreach(v => assert(v >= 0 && v < 2147483647L))
  }

  test("pattern scrub counts PII shapes and checksums the redacted text") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail me at jo.doe+x@test.org or admin@a.co and visit 10.0.0.1"),
      (5L, "the customer table has no secret rows, customer said"),
      (10L, "nothing sensitive here"),
      (3L, "sampled out — must not appear"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps
      .patternScrub(df, "text", "doc_id", sampleMod = 5, TextAnalysisOps.scrubPatterns)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 5L, 10L), "sampleMod filter + order")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(0L) == ((2L, 1L, 0L)), "two emails + one ipv4")
    assert(byId(5L) == ((0L, 0L, 3L)), "customer x2 + secret x1")
    assert(byId(10L) == ((0L, 0L, 0L)))
    // the checksum is of the text AFTER all replacements, in order
    val expected = TextAnalysisOps.scrubPatterns.foldLeft(
      "the customer table has no secret rows, customer said") {
      case (t, (_, re, repl)) => t.replaceAll(re, repl)
    }
    assert(expected == "the <TERM> table has no <TERM> rows, <TERM> said")
    val got = out.filter(_.getLong(0) == 5L).head.getString(4)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == md)
  }

  test("pattern scrub is one scan with no aggregation shuffle") {
    import spark.implicits._
    val df = Seq((0L, "x")).toDF("doc_id", "text")
    val plan = TextAnalysisOps
      .patternScrub(df, "text", "doc_id", sampleMod = 1, TextAnalysisOps.scrubPatterns)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"scrub must stay a per-row projection (sort exchange only):\n${plan.take(600)}")
  }

  test("hashed linear score equals a JVM recomputation of the same hash arithmetic") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text")
    val rows = TextAnalysisOps.hashedLinearScore(df, "text", "doc_id", dim = 64, topN = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def w(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val idx = java.lang.Long.parseLong(h.substring(0, 7), 16) % 64
      (idx * 2654435761L) % 1001L - 500L
    }
    assert(rows(1L) == ((w("alpha") * 2 + w("beta"), 3L)))
    assert(rows(2L) == ((w("gamma"), 1L)))
  }

  test("vocab coverage: hand-computed masses, boundary tie resolves by term order") {
    import spark.implicits._
    // counts: b=3, a=2, c=2, d=1  (8 tokens, 4 types)
    val df = Seq((1L, "a b c"), (2L, "b c a"), (3L, "b d"))
      .toDF("doc_id", "text")
    // V=2: vocab = {b(3), a(2)} — a beats c on the term-asc tiebreak
    val r = TextAnalysisOps.vocabCoverage(df, "text", vocabSize = 2).collect().head
    assert(r.getAs[Long]("vocab_size") == 2L)
    assert(r.getAs[Long]("n_types") == 4L)
    assert(r.getAs[Long]("total_tokens") == 8L)
    assert(r.getAs[Long]("vocab_tokens") == 5L)
    assert(r.getAs[Long]("oov_tokens") == 3L)
    assert(r.getAs[Long]("oov_types") == 2L)
    assert(math.abs(r.getAs[Double]("coverage_ratio") - 0.625) < 1e-9)
  }

  test("vocab coverage: V beyond the type count covers everything") {
    import spark.implicits._
    val df = Seq((1L, "x y x")).toDF("doc_id", "text")
    val r = TextAnalysisOps.vocabCoverage(df, "text", vocabSize = 100).collect().head
    assert(r.getAs[Long]("vocab_size") == 2L)
    assert(r.getAs[Long]("oov_tokens") == 0L)
    assert(r.getAs[Double]("coverage_ratio") == 1.0)
  }

  test("chunking: starts every stride, last chunks shorten, overlap repeats tokens") {
    import spark.implicits._
    // 7 tokens, chunk=4, stride=2 -> starts 0,2,4 with sizes 4,4,3; start 6
    // would be the suffix-duplicate [6,7) inside [4,7) and must NOT emit
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = TextAnalysisOps.chunkDocuments(df, "text", "doc_id", chunk = 4, stride = 2)
      .collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 4L), (1L, 4L), (2L, 3L)))
    def md(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // chunk 1 covers tokens 2..5 — the 8-token overlap convention in action
    assert(out(1).getString(3) == md("t2 t3 t4 t5"))
    assert(out(2).getString(3) == md("t4 t5 t6"))
  }

  test("chunking stops once a window reaches the end (no duplicate-suffix chunks)") {
    import spark.implicits._
    // the ADVICE fixture: 5 tokens, chunk=3, stride=2 -> [0,3), [2,5) and
    // STOP — the old third chunk [4,5) duplicated content of [2,5)
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b"),            // shorter than chunk -> exactly one chunk
      (3L, "a b c d e f g h i"))  // stride>chunk subsample keeps its starts
    .toDF("doc_id", "text")
    val out = TextAnalysisOps.chunkDocuments(df, "text", "doc_id", chunk = 3, stride = 2)
      .collect().filter(_.getLong(0) <= 2L)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 3L), (1L, 1L, 3L), (2L, 0L, 2L)))
    // subsampling regime (stride 4 > chunk 2): 9 tokens -> starts 0,4,8,
    // the trailing 1-token chunk covers NEW content and stays
    val sub = TextAnalysisOps.chunkDocuments(
      df.filter(org.apache.spark.sql.functions.col("doc_id") === 3L),
      "text", "doc_id", chunk = 2, stride = 4)
      .collect()
    assert(sub.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("chunking: stride == chunk is exact segmentation; short/empty docs behave") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),   // 5 tokens, chunk=stride=2 -> sizes 2,2,1
      (2L, "solo"),          // 1 token -> one 1-token chunk
      (3L, "   "),           // zero tokens -> nothing
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.chunkDocuments(df, "text", "doc_id", chunk = 2, stride = 2)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 2L), (1L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 1L)))
    // every token lands in exactly one chunk when stride == chunk
    assert(out.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum == 5L)
  }

  test("chunking is map-only: no exchange in the plan before the output sort") {
    import spark.implicits._
    val df = Seq((0L, "x y z")).toDF("doc_id", "text")
    val plan = TextAnalysisOps.chunkDocuments(df, "text", "doc_id", chunk = 2, stride = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"chunking must not shuffle (sort exchange only):\n${plan.take(600)}")
  }

  test("bigram LM NLL matches hand-computed micro-nats on a closed-form fixture") {
    import spark.implicits._
    // train (odd ids): "a b a b" -> V=2, c(a)=2, c(b)=2, c(a,b)=2, c(b,a)=1
    // scored (even ids): doc 2 = "a b c":
    //   (a,b): p=(2+1)/(2+2)=3/4 -> -ln(3/4)*1e6 = 287682.07 -> 287682
    //   (b,c): p=(0+1)/(2+2)=1/4 -> -ln(1/4)*1e6 = 1386294.36 -> 1386294
    // doc 4 = "z" has no bigrams -> no row
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.bigramLmNll(df, "text", "doc_id", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 2L, 1673976L, 836988L)), s"got ${out.toSeq}")
  }

  test("bigram LM scores only the held-out half, deterministically") {
    val a = TextAnalysisOps.bigramLmNll(docs, "text", "doc_id", topN = 25).collect().toSeq
    assert(a.nonEmpty)
    // only even ids are scored
    assert(a.forall(_.getLong(0) % 2 == 0))
    val b = TextAnalysisOps.bigramLmNll(
      docs.repartition(13), "text", "doc_id", topN = 25).collect().toSeq
    assert(a == b)
  }

  test("term drift: hand-computed chi2 on a 2x2 fixture, symmetric between terms") {
    import spark.implicits._
    // side 0: "a a b" (ta=3), side 1: "a b b b" (tb=4). For BOTH terms the
    // 2x2 table has |det| = 5, total 7, row/col products 3*4*3*4 = 144:
    // chi2 = 7*25/144 = 1.215278 — equal scores, order falls to term asc
    val df = Seq((0L, "a a b"), (1L, "a b b b")).toDF("doc_id", "text")
      .withColumn("side", col("doc_id") % 2)
    val out = TextAnalysisOps.termDrift(df, "text", "side", minCount = 1, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 2L, 1L, 1.215278),
      ("b", 1L, 3L, 1.215278)), s"got ${out.toSeq}")
  }

  test("term drift is deterministic and identical terms score zero") {
    import spark.implicits._
    // both slices have the same distribution -> det = 0 for every term
    val flat = Seq((0L, "x y x y"), (1L, "x y x y")).toDF("doc_id", "text")
      .withColumn("side", col("doc_id") % 2)
    TextAnalysisOps.termDrift(flat, "text", "side", minCount = 1, topN = 10)
      .collect().foreach(r => assert(r.getDouble(3) == 0.0, s"$r"))
    val a = TextAnalysisOps.termDrift(
      docs.withColumn("side", col("doc_id") % 2), "text", "side",
      minCount = 5, topN = 20).collect().toSeq
    assert(a.nonEmpty)
    val b = TextAnalysisOps.termDrift(
      docs.repartition(13).withColumn("side", col("doc_id") % 2), "text", "side",
      minCount = 5, topN = 20).collect().toSeq
    assert(a == b)
  }

  test("pmi collocations: hand-computed lift ratios, min-count floor, tie-free order") {
    import spark.implicits._
    // N = 12 tokens, M = 9 bigrams; counts: new=3 york=3 the=4 a=1 b=1
    //   (new,york) 3x -> 3*144/(9*3*3) = 5.333333
    //   (york,new) 2x -> 2*144/(9*3*3) = 3.555556
    //   (the,the)  3x -> 3*144/(9*4*4) = 3.0
    //   (a,b) appears once -> dropped by minCount=2
    val df = Seq(
      (1L, "new york new york new york"),
      (2L, "the the the the"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysisOps.pmiCollocations(df, "text", minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("new", "york", 3L, 5.333333),
      ("york", "new", 2L, 3.555556),
      ("the", "the", 3L, 3.0)), s"got ${out.toSeq}")
  }

  test("pmi collocations are deterministic on the real corpus") {
    val a = TextAnalysisOps.pmiCollocations(docs, "text", minCount = 3, topN = 20)
      .collect().toSeq
    assert(a.nonEmpty)
    val b = TextAnalysisOps.pmiCollocations(docs.repartition(13), "text",
      minCount = 3, topN = 20).collect().toSeq
    assert(a == b)
  }

  test("ngram novelty: first occurrence owns the gram, later docs count it as repeated") {
    import spark.implicits._
    // doc 1: trigrams {a b c, b c d} — both first here -> fully novel
    // doc 2: {a b c (seen in 1), b c x} -> 1 of 2 repeated, novelty 500000
    // doc 3: "a b c" REPEATED twice in one doc -> distinct counts once;
    //        all its grams seen earlier -> novelty 0
    // doc 4: two tokens, no trigrams -> absent
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c x"),
      (3L, "a b c a b c"), (4L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.ngramNovelty(df, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 0L, 1000000L),
      (2L, 2L, 1L, 500000L),
      // doc 3 grams: {a b c, b c a, c a b} distinct=3; only "a b c" seen
      // earlier -> repeated=1, novelty (2*1e6) div 3
      (3L, 3L, 1L, 666666L)), s"got ${out.toSeq}")
  }

  test("ngram novelty is repartition-invariant on the real corpus") {
    val a = TextAnalysisOps.ngramNovelty(docs, "text", "doc_id", n = 3).collect().toSeq
    assert(a.nonEmpty)
    val b = TextAnalysisOps.ngramNovelty(docs.repartition(13), "text", "doc_id", n = 3)
      .collect().toSeq
    assert(a == b)
    // ratios are internally consistent
    a.foreach { r =>
      val (d, rep, nov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rep <= d && nov == ((d - rep) * 1000000L) / d)
    }
  }

  test("winnowing: any substring match of win+k-1 tokens shares a fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // k=3, win=4: the guarantee threshold is a 6-token shared run. Two
    // docs embed the same 8-token run inside disjoint noise; a third
    // shares nothing. Fingerprint SETS (not just counts) via the same
    // kernel with the checksum swapped for the raw array.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"n1a n1b n1c $shared n1d n1e"),
      (2L, s"m1a m2b $shared m3c m4d m5e m6f"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"))
      .toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"), graft.functions.TextHash.tokens(col("text")).as("tk"))
      .select(col("doc_id"), transform(
        graft.functions.TextHash.orderedShingles(col("tk"), 3),
        s => graft.functions.TextHash.hash28(s)).as("hs"))
      .select(col("doc_id"), transform(
        sequence(lit(1), size(col("hs")) - 3),
        j => array_min(slice(col("hs"), j, lit(4)))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing an 8-token run must share a window minimum")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint-vocabulary docs share nothing")
    // the op's reported counts agree with the raw kernel
    val out = TextAnalysisOps.winnowingFingerprints(df, "text", "doc_id", k = 3, win = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    out.foreach { case (id, (nSh, nWin, nFp)) =>
      assert(nWin == nSh - 3 && nFp == fps(id).size, s"doc $id")
    }
  }

  test("WinnowExplode generator equals the HOF fingerprint sets on the real corpus") {
    // q144's pair path now fingerprints through the one-pass Generator
    // (the HOF chain's fused codegen took ~60 s to compile per plan);
    // the two forms must stay bit-identical: same tokens, same hash28,
    // same window minima, same distinct set
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val gen = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.Generators.winnowExplode(col("text"), 3, 4).as(Seq("n_fp", "fp")))
      .groupBy("doc_id")
      .agg(max(col("n_fp")).as("n_fp"), sort_array(collect_list(col("fp"))).as("fps"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val hof = TextAnalysisOps.winnowingFingerprints(docs, "text", "doc_id", k = 3, win = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_fp"), r.getAs[String]("fp_md5"))).toMap
    assert(gen.keySet == hof.keySet, "same docs must carry fingerprints")
    val md = java.security.MessageDigest.getInstance("MD5")
    gen.foreach { case (id, (n, fps)) =>
      assert(n == hof(id)._1, s"doc $id distinct-fp count")
      assert(fps.length.toLong == n, s"doc $id emits each distinct fp once")
      assert(fps.distinct.length == fps.length)
      // fp VALUES equal the HOF set: recompute the q122 md5-of-sorted form
      md.reset()
      val hex = md.digest(fps.sorted.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(hex == hof(id)._2, s"doc $id fingerprint values diverge from the HOF form")
    }
  }

  test("winnowing: short docs absent, density bounded, map-only plan, repartition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 5 tokens < k + win - 1 = 6: no full window, doc absent
    val tiny = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(TextAnalysisOps.winnowingFingerprints(tiny, "text", "doc_id", 3, 4).count() == 0L)
    val out = TextAnalysisOps.winnowingFingerprints(docs, "text", "doc_id", 3, 4)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWin, nFp) = (r.getLong(2), r.getLong(3))
      // each position's hash is the minimum of at most `win` windows — a
      // HARD per-doc upper bound
      assert(nFp <= nWin, r.toString)
    }
    // the 2/(win+1) density is an EXPECTATION under hash uniformity, not a
    // per-doc guarantee (a repetitive doc can legitimately select far
    // fewer distinct minima) — so the lower bound is asserted on the
    // corpus AGGREGATE only, where the expectation concentrates
    val (totFp, totWin) = rows.foldLeft((0L, 0L)) { case ((f, w), r) =>
      (f + r.getLong(3), w + r.getLong(2))
    }
    assert(totFp.toDouble >= totWin.toDouble / 4,
      s"aggregate winnowing density collapsed: $totFp fingerprints over $totWin windows")
    val re = TextAnalysisOps.winnowingFingerprints(docs.repartition(9), "text", "doc_id", 3, 4)
      .collect()
    assert(rows.toSeq == re.toSeq)
    // map-only kernel: the only Exchange is the final presentation sort's
    // range partitioning — no hash-partitioned shuffle (agg/join) anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("Exchange rangepartitioning"))
  }

  test("vocabulary growth: cumulative curve is monotone and lands on the corpus totals") {
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sf)
    val rows = TextAnalysisOps.vocabularyGrowth(docs, "text", "doc_id").collect()
    assert(rows.nonEmpty)
    // monotone non-decreasing in every cumulative column
    val seq = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    seq.zip(seq.tail).foreach { case (a, b) =>
      assert(a._1 <= b._1 && a._2 <= b._2 && a._3 <= b._3, s"$a -> $b")
    }
    // the last point IS the whole corpus: doc count, token count, and
    // distinct vocabulary recomputed independently (docs counted by
    // token PRESENCE, matching the op — a non-null zero-token doc emits
    // no rows on either engine)
    val base = docs.filter(col("text").isNotNull)
    val terms = base.select(col("doc_id"),
      graft.functions.Generators.ngramExplode(col("text"), 1).as("t"))
    val (nDocs, nToks, nTypes) =
      (terms.select("doc_id").distinct().count(), terms.count(),
        terms.select("t").distinct().count())
    assert(seq.last == ((nDocs, nToks, nTypes)), s"got ${seq.last}")
    // Heaps: vocabulary grows strictly slower than tokens once the
    // vocabulary saturates relative to corpus size
    assert(seq.last._3 <= seq.last._2)
  }

  test("dsir: target-slanted docs outweigh off-target docs, repartition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target (is_t=1) docs speak 'alpha beta', others 'gamma delta' — a
    // doc of pure target vocabulary must outrank a doc of pure off-target
    // vocabulary; mixed sits between
    val rows = (0L until 40L).map { i =>
      val t = i % 2 == 0
      val text = if (t) "alpha beta alpha beta alpha" else "gamma delta gamma delta gamma"
      (i, text, t)
    } ++ Seq((100L, "alpha beta alpha beta", false), (101L, "alpha gamma", false))
    val df = rows.toDF("doc_id", "text", "is_t")
    val w = TextAnalysisOps.dsirWeights(df, "text", "doc_id",
      targetExpr = col("is_t"), dim = 64, topN = 42)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val alphaDoc = w(0L); val gammaDoc = w(1L); val mixed = w(101L)
    assert(alphaDoc > gammaDoc, s"target vocab must outweigh: $alphaDoc vs $gammaDoc")
    assert(mixed > gammaDoc && mixed < alphaDoc, s"mixed doc must sit between: $mixed")
    // doc 100 speaks pure target vocabulary while labeled off-target: its
    // per-token weight matches doc 0's buckets (scores depend on CONTENT)
    assert(w(100L) > gammaDoc)
    val re = TextAnalysisOps.dsirWeights(df.repartition(7), "text", "doc_id",
      targetExpr = col("is_t"), dim = 64, topN = 42)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == w)
  }

  test("threshold sweep matches a driver-side recomputation from the scored relation") {
    import org.apache.spark.sql.functions._
    val thresholds = Seq(-2000L, 0L, 1000L, 2500L, 5000L)
    val scored = TextAnalysisOps.hashedDocScores(docs, "text", "doc_id", dim = 1024)
      .join(docs.filter(col("text").isNotNull)
        .select(col("doc_id"), (col("lang") === "en").as("label")), "doc_id")
      .collect().map(r => (r.getAs[Long]("score"), r.getAs[Boolean]("label")))
    val got = TextAnalysisOps.scoreThresholdSweep(docs, "text", "doc_id",
      labelExpr = col("lang") === "en", dim = 1024, thresholds = thresholds)
      .collect()
    assert(got.length == thresholds.length)
    val actualPos = scored.count(_._2).toLong
    got.foreach { r =>
      val t = r.getAs[Long]("threshold")
      val predPos = scored.count(_._1 >= t).toLong
      val tp = scored.count(s => s._1 >= t && s._2).toLong
      assert(r.getAs[Long]("n_docs") == scored.length.toLong)
      assert(r.getAs[Long]("pred_pos") == predPos, s"pred_pos at $t")
      assert(r.getAs[Long]("tp") == tp, s"tp at $t")
      assert(r.getAs[Long]("actual_pos") == actualPos)
      assert(r.getAs[Long]("precision_ppm") ==
        (if (predPos == 0) 0L else tp * 1000000L / predPos))
      assert(r.getAs[Long]("recall_ppm") ==
        (if (actualPos == 0) 0L else tp * 1000000L / actualPos))
    }
    // operating-point monotonicity: raising the cutoff never admits more
    val byT = got.sortBy(_.getAs[Long]("threshold"))
    byT.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("pred_pos") >= hi.getAs[Long]("pred_pos"))
      assert(lo.getAs[Long]("recall_ppm") >= hi.getAs[Long]("recall_ppm"))
    }
  }

  test("threshold sweep is repartition-invariant and rejects duplicate cutoffs") {
    import org.apache.spark.sql.functions._
    val a = TextAnalysisOps.scoreThresholdSweep(docs, "text", "doc_id",
      labelExpr = col("lang") === "en", dim = 256, thresholds = Seq(0L, 500L))
      .collect().toSeq
    val b = TextAnalysisOps.scoreThresholdSweep(docs.repartition(11), "text", "doc_id",
      labelExpr = col("lang") === "en", dim = 256, thresholds = Seq(0L, 500L))
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysisOps.scoreThresholdSweep(docs, "text", "doc_id",
        labelExpr = col("lang") === "en", dim = 256, thresholds = Seq(1L, 1L))
    }
  }

  test("zipf slope: an exact power law regresses to its exponent") {
    import spark.implicits._
    // counts 64, 32, 16, 8 at ranks 1..4 — an exact 2^-rank law, so
    // ln(count) = ln(128) - rank·ln2 ... against ln(RANK) it is not exact,
    // but the slope must be strongly negative and the top term must be
    // the count-64 token; a uniform corpus must regress to ~0
    val rows = (1 to 64).map(_ => "aa") ++ (1 to 32).map(_ => "bb") ++
      (1 to 16).map(_ => "cc") ++ (1 to 8).map(_ => "dd")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = TextAnalysisOps.zipfSlope(df, "text", topR = 64).collect()(0)
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(r.getAs[String]("top_term") == "aa" && r.getAs[Long]("top_count") == 64L)
    assert(r.getAs[Long]("slope_ppm") < -1000000L) // decays faster than 1/rank
    val flat = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val rf = TextAnalysisOps.zipfSlope(flat, "text", topR = 8).collect()(0)
    assert(rf.getAs[Long]("slope_ppm") == 0L) // equal counts: exactly flat
    intercept[IllegalArgumentException] {
      TextAnalysisOps.zipfSlope(df, "text", topR = 1)
    }
  }

  test("winnowing pairs: verbatim overlap guarantees a pair, excerpt scores full containment") {
    import spark.implicits._
    val span = "one two three four five six seven eight nine ten"
    val df = Seq(
      (1L, span + " extra tail words here continue on and on"),
      (2L, "prefix words lead in here " + span), // shares the 10-token span
      (3L, span), // doc 3 IS the span: its fp set ⊆ both supersets
      (4L, "completely unrelated vocabulary with no common substring"))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.winnowingPairs(df, "text", "doc_id",
        k = 3, win = 4, minShared = 1, limit = 50)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    // winnowing guarantee: a shared >= win+k-1 = 6-token substring forces
    // >= 1 shared fingerprint -> all three span-carrying pairs exist
    assert(r.contains((1L, 2L)) && r.contains((1L, 3L)) && r.contains((2L, 3L)))
    assert(!r.keys.exists(p => p._1 == 4L || p._2 == 4L))
    // containment orientation: the pure-excerpt doc is fully covered
    assert(r((1L, 3L)).getAs[Long]("overlap_ppm") == 1000000L)
    assert(r((2L, 3L)).getAs[Long]("overlap_ppm") == 1000000L)
    r.values.foreach { x =>
      assert(x.getAs[Long]("n_shared") <=
        math.min(x.getAs[Long]("n_fp_a"), x.getAs[Long]("n_fp_b")))
    }
  }

  test("longest token run: first maximal run wins ties, whitespace docs drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b b"), // run 3 of 'a'
      (2L, "b b a a"), // tie at 2: FIRST maximal run -> 'b'
      (3L, "x"), // single token: run 1
      (4L, "   "), // no tokens: absent
      (5L, "c d c d c d")) // no adjacent repeat: run 1, first token 'c'
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.longestTokenRun(df, "text", "doc_id", limit = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == (5L, 3L, "a"))
    assert(r(2L) == (4L, 2L, "b"))
    assert(r(3L) == (1L, 1L, "x"))
    assert(r(5L) == (6L, 1L, "c"))
    assert(!r.contains(4L))
    // ordering: worst repeater first
    val first = TextAnalysisOps.longestTokenRun(df, "text", "doc_id", limit = 1)
      .collect()(0)
    assert(first.getLong(0) == 1L && first.getLong(2) == 3L)
  }

  test("distinct-n: repetition collapses distinct-2 while distinct-1 holds") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "a b a b a b a b"), // 2 distinct unigrams, 2 distinct bigrams/7
      (2L, "de", "a b c d e f g h") // all distinct at every n
    ).toDF("doc_id", "lang", "text")
    val r = TextAnalysisOps.distinctNgramDiversity(df, "text", "lang", maxN = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(("en", 1L)) == (8L, 2L, 250000L))
    assert(r(("en", 2L)) == (7L, 2L, 285714L))
    assert(r(("de", 1L)) == (8L, 8L, 1000000L))
    assert(r(("de", 2L)) == (7L, 7L, 1000000L))
    // a group whose docs are all shorter than n is absent for that n
    val short = Seq((1L, "en", "solo")).toDF("doc_id", "lang", "text")
    val rs = TextAnalysisOps.distinctNgramDiversity(short, "text", "lang", maxN = 2)
      .collect()
    assert(rs.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("quality ensemble: integer metric derivation and rank-blend ordering") {
    import spark.implicits._
    val one = Seq((7L, "aa bb aa")).toDF("doc_id", "text")
    val Array(r) = TextAnalysisOps.qualityEnsemble(one, "text", "doc_id", limit = 5)
      .collect()
    // 3 tokens, 2 distinct -> 666666 ppm, 6 chars -> 200 centi; single doc
    // ranks are all 10^6 and so is the blend
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (7L, 3L, 666666L, 200L))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      (1000000L, 1000000L, 1000000L, 1000000L))
    // real corpus: exact limit rows, blend non-increasing, ids unique
    val rows = TextAnalysisOps.qualityEnsemble(
      Tables.documents(spark, sf), "text", "doc_id", limit = 20).collect()
    assert(rows.length == 20)
    val blends = rows.map(_.getLong(7)).toSeq
    assert(blends == blends.sorted.reverse, "blend must be non-increasing")
    assert(rows.map(_.getLong(0)).distinct.length == 20)
  }

  test("zipfSlopeByGroup: agrees with the global slope on a single-group corpus; flags flat groups") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val single = docs.withColumn("__one", org.apache.spark.sql.functions.lit("g"))
    val grouped = TextAnalysisOps.zipfSlopeByGroup(single, "text", "__one", topR = 32)
      .collect()
    val global = TextAnalysisOps.zipfSlope(docs, "text", topR = 32).collect().head
    assert(grouped.length == 1)
    assert(grouped.head.getAs[Long]("slope_ppm") == global.getAs[Long]("slope_ppm"))
    assert(grouped.head.getAs[String]("top_term") == global.getAs[String]("top_term"))
    // a uniform-frequency group has slope ~0; a skewed one is negative
    val fixture = ((1 to 8).flatMap(i => Seq((s"u$i", "flat"))) ++
      (1 to 16).map(_ => ("hot", "skew")) ++ (1 to 8).map(i => (s"w$i", "skew")) ++
      (1 to 4).map(_ => ("warm", "skew")))
      .map { case (tok, g) => (g, tok) }
      .toDF("src", "text")
    val r = TextAnalysisOps.zipfSlopeByGroup(fixture, "text", "src", topR = 32)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("slope_ppm")).toMap
    assert(r("flat") == 0L, "uniform frequencies must regress to slope 0")
    assert(r("skew") < -100000L, "skewed frequencies must slope down")
  }

  test("dupSpanProfile: a planted 8-token clone lights the ladder up to its length") {
    import spark.implicits._
    val clone = "one two three four five six seven eight"
    val df = Seq(
      (1L, clone + " tail alpha beta"), (2L, "head gamma " + clone),
      (3L, "completely unrelated words here delta epsilon zeta"))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.dupSpanProfile(df, "text", "doc_id",
      ladder = Seq(1, 2, 4, 8, 16))
      .collect().map(x => x.getLong(0) -> x).toMap
    // the shared 8-token span forces dup windows at L = 1, 2, 4, 8
    Seq(1L, 2L, 4L, 8L).foreach { l =>
      assert(r(l).getAs[Long]("n_dup_windows") >= 2, s"L=$l must see the clone")
      assert(r(l).getAs[Long]("n_dup_docs") == 2L, s"L=$l dup docs")
    }
    // at L=8 the clone is exactly one window per doc and the only dup
    assert(r(8L).getAs[Long]("n_dup_windows") == 2L)
    // no 16-token verbatim overlap exists
    assert(r(16L).getAs[Long]("n_dup_windows") == 0L)
    assert(r(16L).getAs[Long]("n_dup_docs") == 0L)
    // rung rows exist even where no doc is long enough
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    val s16 = TextAnalysisOps.dupSpanProfile(short, "text", "doc_id", Seq(16))
      .collect().head
    assert(s16.getLong(0) == 16L && s16.getAs[Long]("n_windows") == 0L &&
      s16.getAs[Long]("dup_ppm") == 0L)
  }

  test("MultiNgramHashExplode equals per-rung NgramExplode + hash60 on the real corpus") {
    // q171's one-pass generator must stay bit-identical to the SQL-visible
    // form: same tokens, same windows, same 60-bit md5 ints, multiset-equal
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val ladder = Seq(1, 3, 8)
    val gen = docs
      .select(col("doc_id"),
        graft.functions.Generators.multiNgramHashExplode(col("text"), ladder)
          .as(Seq("span", "h")))
      .groupBy("span", "h").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = ladder.flatMap { l =>
      docs.select(
        graft.functions.Generators.ngramExplode(col("text"), l).as("w"))
        .select(graft.functions.TextHash.hash60(col("w")).as("h"))
        .groupBy("h").agg(count(lit(1)).as("c"))
        .collect().map(r => (l.toLong, r.getLong(0)) -> r.getLong(1))
    }.toMap
    assert(gen == ref, "one-pass multi-span hashes must equal the per-rung hash60 form")
  }

  test("tokenEntropyByGroup: hand-computed micro-nats, single-type null evenness, clamped floor") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b", "s1"), (2L, "a", "s1"),        // a:3 b:1 -> N=4 V=2
      (3L, "x x x", "s2"),                          // N=3 V=1: H=0, eff null
      (4L, null.asInstanceOf[String], "s1"), (5L, "y", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysisOps.tokenEntropyByGroup(df, "text", "source")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("s1", "s2"), "null text/group rows must drop")
    // H(s1) = ln 4 - (3 ln 3)/4 in micro-nats, every step integer:
    // round(ln4*1e6)=1386294, 3*round(ln3*1e6)=3295836, div 4 = 823959
    val s1 = r("s1")
    assert(s1.getAs[Long]("n_tokens") == 4L && s1.getAs[Long]("n_types") == 2L)
    assert(s1.getAs[Long]("entropy_micro") == 562335L)
    assert(s1.getAs[Long]("efficiency_ppm") == 811278L)
    val s2 = r("s2")
    assert(s2.getAs[Long]("n_tokens") == 3L && s2.getAs[Long]("n_types") == 1L)
    assert(s2.getAs[Long]("entropy_micro") == 0L)
    assert(s2.isNullAt(s2.fieldIndex("efficiency_ppm")),
      "single-type group has undefined evenness")
    // uniform distribution: H = ln V exactly -> evenness 10^6
    val uni = Seq((1L, "p q r s", "u")).toDF("doc_id", "text", "source")
    val ru = TextAnalysisOps.tokenEntropyByGroup(uni, "text", "source")
      .collect().head
    assert(ru.getAs[Long]("entropy_micro") == 1386294L)
    assert(ru.getAs[Long]("efficiency_ppm") == 1000000L)
  }

  test("sourceKlDivergence: hand-computed micro-nats, pool-identical source clamps to 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b", "s1"), (2L, "a b b b", "s2"),
      (3L, null.asInstanceOf[String], "s1"), (4L, "z", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysisOps.sourceKlDivergence(df, "text", "source")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("s1", "s2"), "null text/group rows must drop")
    // corpus a:3 b:4 N=7; s1 = {a:2, b:1}; s2 = {a:1, b:3} — every step
    // integer: P = Σ c·(round(ln d·1e6) − round(ln c·1e6)), KL =
    // lN − lNs − P div Ns (values recomputed in the DuckDB dry-run)
    assert(r("s1").getAs[Long]("kl_micro") == 114890L)
    assert(r("s1").getAs[Long]("n_tokens") == 3L && r("s1").getAs[Long]("n_types") == 2L)
    assert(r("s2").getAs[Long]("kl_micro") == 69202L)
    // a single-source corpus IS the pool: KL exactly 0 (c = d, Ns = N)
    val solo = Seq((1L, "p q p r", "only")).toDF("doc_id", "text", "source")
    assert(TextAnalysisOps.sourceKlDivergence(solo, "text", "source")
      .collect().head.getAs[Long]("kl_micro") == 0L)
    // two identically-distributed sources: both ~0 after the clamp
    val sym = Seq((1L, "x y", "l"), (2L, "x y", "r")).toDF("doc_id", "text", "source")
    TextAnalysisOps.sourceKlDivergence(sym, "text", "source").collect()
      .foreach(x => assert(x.getAs[Long]("kl_micro") <= 1L,
        s"identical halves must be ~0: $x"))
  }

  test("patternDensity: per-source hit shares and densities off a planted fixture") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at bob@example.com today", "s1"),   // email x1
      (2L, "nothing sensitive here at all okay", "s1"),
      (3L, "secret secret customer plan", "s2"))            // denylist x3
      .toDF("doc_id", "text", "source")
    val r = TextAnalysisOps.patternDensity(df, "text", "source",
      TextAnalysisOps.scrubPatterns)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("s1").getAs[Long]("n_docs") == 2L)
    assert(r("s1").getAs[Long]("docs_email") == 1L && r("s1").getAs[Long]("n_email") == 1L)
    assert(r("s1").getAs[Long]("hit_docs_ppm") == 500000L)
    assert(r("s2").getAs[Long]("n_denylist") == 3L)
    assert(r("s2").getAs[Long]("hit_docs_ppm") == 1000000L)
    // density: 3 matches over 27 chars -> 3*1e6 div 27
    assert(r("s2").getAs[Long]("match_per_mchar") ==
      3L * 1000000L / r("s2").getAs[Long]("n_chars"))
  }

  test("boilerplatePrefixes: the dominant opening per source with its share") {
    import spark.implicits._
    val df = Seq(
      (1L, "subscribe to our newsletter now", "s1"),
      (2L, "subscribe to our channel today", "s1"),
      (3L, "totally original text here", "s1"),
      (4L, "alpha beta gamma", "s2"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysisOps.boilerplatePrefixes(df, "text", "source", prefixLen = 3)
      .collect().map(x => x.getString(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("s1") == (("subscribe to our", 3L, 2L, 666666L)))
    assert(r("s2") == (("alpha beta gamma", 1L, 1L, 1000000L)))
  }

  test("skipgramPairs: window-2 pairs of 'a b a c' match the hand enumeration") {
    import spark.implicits._
    // offset 1: (a,b) (a,b) (a,c); offset 2: (a,a) (b,c)
    val df = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val r = TextAnalysisOps.skipgramPairs(df, "text", window = 2, k = 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq(("a", "b", 2L), ("a", "a", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("skipgramPairs: direction never splits counts; short docs and nulls drop; k caps") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, "y x"), (3L, "solo"), (4L, null))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.skipgramPairs(df, "text", window = 2, k = 10).collect()
    assert(r.length == 1)
    assert((r.head.getString(0), r.head.getString(1), r.head.getLong(2)) == (("x", "y", 2L)))
    val capped = TextAnalysisOps.skipgramPairs(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"), "text", window = 2, k = 3)
    assert(capped.count() == 3)
  }

  test("langMixtureProfile: hand-computed chunks, ties break to the first candidate, entropy exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "the of der die"),   // en-chunk + de-chunk: 50/50 mix
      (2L, "the the the the"),  // en + en: monolingual, entropy 0
      (3L, "zzz qqq"),          // zero markers -> all-tie -> "de" (cand asc)
      (4L, null.asInstanceOf[String]), // dropped
      (5L, "the of und"))       // trailing PARTIAL chunk still classified
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.langMixtureProfile(df, "text", "doc_id", chunkTokens = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3), x.getLong(4), x.getLong(5), x.getLong(6)))
      .toMap
    val ln2 = math.round(math.log(2.0) * 1e6) // 693147
    // doc 1: counts {en:1, de:1} -> top = de (tie, candidate asc),
    // share 1/2, H = ln 2 - (1*ln1 + 1*ln1)/2 = ln 2
    assert(r(1L) == ((2L, 2L, "de", 1L, 500000L, ln2)))
    // doc 2: {en:2} -> H = ln 2 - (2*ln2 div 2) = 0
    assert(r(2L) == ((2L, 1L, "en", 2L, 1000000L, 0L)))
    // doc 3: one chunk, no markers anywhere -> every candidate scores 0,
    // argmax falls to the lexicographically first language
    assert(r(3L) == ((1L, 1L, "de", 1L, 1000000L, 0L)))
    assert(!r.contains(4L))
    // doc 5: ["the","of"] -> en; ["und"] -> de (partial trailing chunk)
    assert(r(5L) == ((2L, 2L, "de", 1L, 500000L, ln2)))
    // map-only contract: no exchange before the output sort
    val plan = TextAnalysisOps.langMixtureProfile(df, "text", "doc_id", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"),
      s"mixture profile must not aggregate:\n${plan.take(600)}")
  }
}

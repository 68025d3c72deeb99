package graft.ops

import graft.functions.TextHash.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** END-TO-END curation funnel: the composed pipeline a training-data run
  * actually executes, as ONE operator — quality filter, exact dedup,
  * benchmark decontamination, token-budget selection — reporting the doc
  * and token counts surviving each stage (the "funnel report" every
  * curation paper tabulates; cf. RefinedWeb/Gopher pipeline tables).
  *
  * Stages (each consumes the previous stage's survivors):
  *   0 raw            non-null-text corpus docs (bench docs excluded)
  *   1 quality        Gopher-style rule mask == 0
  *     ([[TextAnalysisOps.gopherRuleMask]])
  *   2 dedup          min-id keeper per `prefixLen`-token prefix key
  *     ([[DedupOps.exactDedup]] semantics)
  *   - neardup        (OPTIONAL, `ndBands` > 0 — the RefinedWeb/FineWeb
  *     ordering runs fuzzy dedup between exact dedup and
  *     decontamination) MinHash-LSH pairs over the survivors
  *     ([[DedupOps.minhashVerifiedPairs]], the complete pair set — no
  *     top-K truncation), clustered by
  *     [[DedupOps.connectedComponents]]; keeper = lowest doc id per
  *     cluster, singletons survive untouched
  *   3 decontaminated distinct-shingle overlap vs the broadcast benchmark
  *     shingle union stays UNDER maxOverlapNum/maxOverlapDen
  *     ([[DedupOps.contaminationReport]] semantics; integer
  *     cross-multiplied threshold — no ratio doubles on the boundary)
  *   4 budget         first `budget` tokens in deterministic md5 order
  *     ([[SampleOps.budgetSample]])
  * With the neardup stage enabled the later stages renumber (neardup=3,
  * decontaminated=4, budget=5); stage NAMES are the stable identifier.
  *
  * The benchmark set is carved from the same input (`idCol % benchMod ==
  * 0`), mirroring the decontamination catalog query; production callers
  * pass a real eval set by unioning it in with ids in that residue class.
  *
  * 100 TB shape: every stage is the already-audited distributed form —
  * the funnel adds NO new shuffle beyond its stages (one bigram shuffle,
  * one prefix-key shuffle, one shingle join against a broadcast bench
  * union, one bucketed prefix-sum). Each stage's aggregate is one
  * map-side-combinable count+sum. The per-stage survivor frames are
  * (doc_id, n_tokens) — metadata-sized relative to the corpus — and each
  * feeds 2-3 downstream branches, so they are localCheckpoint'ed: the
  * bigram and prefix-key shuffles run ONCE instead of once per consumer
  * (measured 2.9 s → ~1 s on the bench; the
  * [[graft.ops.SimilarityOps.pqAnn]] codebook pattern).
  */
object CurationOps {

  /** Session-scoped memo of the funnels' SHARED stage-0–2 prefix —
    * (masked, s2): the per-doc rule-mask frame and the exact-dedup
    * survivor frame, both per-doc integers and already
    * localCheckpoint'ed. The q71 base funnel and the q96 near-dup funnel
    * run IDENTICAL quality + exact-dedup stages over the same corpus, so
    * the second caller per (session, key) skips the corpus tokenization,
    * the mask pass and the prefix-key shuffle entirely — the
    * [[RetrievalOps.moreLikeThisShared]] / [[GraphOps.symmetricEdgesShared]]
    * convention, third instance. Every stage-0–2 parameter folds into
    * the key as a TUPLE FIELD (the stopword list as a List, not a
    * delimiter-joined string — a stopword containing the delimiter can
    * never alias two parameterizations), plus [[MemoFingerprint]] of the
    * docs relation, so a reused srcKey over changed backing data
    * recomputes instead of serving a stale prefix. */
  private val stageMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, Any), (DataFrame, DataFrame)]()
  /** Memo-hit counter, exposed for the spec only. */
  private[graft] val stageMemoHits = new java.util.concurrent.atomic.AtomicLong(0)

  def curationFunnel(
      docs: DataFrame, textCol: String, idCol: String,
      stopwords: Seq[String],
      minTokens: Long, maxTokens: Long, minStops: Long,
      prefixLen: Int, w: Int, benchMod: Int,
      maxOverlapNum: Long, maxOverlapDen: Long,
      budget: Long,
      ndMinJaccard: Double = 0.0, ndBands: Int = 0, ndR: Int = 2,
      sharedStageKey: Option[String] = None): DataFrame = {
    require(benchMod >= 2, s"benchMod must be >= 2: $benchMod")
    require(maxOverlapDen > 0 && maxOverlapNum >= 0,
      s"overlap threshold must be a non-negative fraction: $maxOverlapNum/$maxOverlapDen")
    val corpus = docs.filter(col(textCol).isNotNull && col(idCol) % benchMod =!= 0)
    val bench = docs.filter(col(textCol).isNotNull && col(idCol) % benchMod === 0)

    // stages 0-2, optionally through the session memo: per-doc rule mask
    // (one pass) and the deterministic min-id keeper per content prefix
    def buildStages(): (DataFrame, DataFrame) = {
      val masked = TextAnalysisOps.gopherRuleMask(
        corpus, textCol, idCol, stopwords, minTokens, maxTokens, minStops)
        .localCheckpoint()
      val s1m = masked.filter(col("rule_mask") === 0L).select("doc_id", "n_tokens")
      val keyed = corpus
        .select(col(idCol).as("doc_id"),
          concat_ws(" ", slice(tokens(col(textCol)), 1, prefixLen)).as("__key"))
        .join(s1m, "doc_id")
      val wKey = Window.partitionBy(col("__key")).orderBy(col("doc_id").asc)
      val s2m = keyed
        .withColumn("__rn", row_number().over(wKey))
        .filter(col("__rn") === 1)
        .select("doc_id", "n_tokens")
        .localCheckpoint()
      (masked, s2m)
    }
    val (masked, s2) = sharedStageKey match {
      case None => buildStages()
      case Some(srcKey) =>
        stageMemo.forEach { (key, _) =>
          if (key._1.sparkContext.isStopped) stageMemo.remove(key)
        }
        val key = (docs.sparkSession,
          (MemoFingerprint.of(docs), srcKey, textCol, idCol,
            stopwords.toList, minTokens, maxTokens, minStops, prefixLen,
            benchMod))
        val prev = stageMemo.get(key)
        if (prev != null) { stageMemoHits.incrementAndGet(); prev }
        else stageMemo.computeIfAbsent(key, _ => buildStages())
    }
    val s1 = masked.filter(col("rule_mask") === 0L).select("doc_id", "n_tokens")

    // optional fuzzy near-dup stage over the exact-dedup survivors:
    // complete MinHash-LSH pair set (no top-K cut — truncating the edge
    // list would change cluster structure), connected components, keep
    // the lowest doc id per cluster. Docs in no pair are singletons and
    // survive. Adds the stages' only iterative step; every round is one
    // shuffle join + aggregate, no driver-side data. Measured cost at
    // sf0.1: ~5.7 s enabled vs ~1.5 s disabled — almost exactly the
    // standalone pairs+clustering queries' cost added to the base
    // funnel; the stage's cost IS the stage.
    val s2b =
      if (ndBands <= 0) s2
      else {
        val survivors = corpus
          .join(s2.select(col("doc_id").as("__sid")), col(idCol) === col("__sid"))
          .drop("__sid")
        val pairs = DedupOps.minhashVerifiedPairs(
          survivors, textCol, idCol, w, ndBands, ndR, ndMinJaccard)
        val losers = DedupOps.connectedComponents(pairs, "doc_a", "doc_b")
          .filter(col("node") =!= col("cluster_id"))
          .select(col("node").as("doc_id"))
        s2.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
      }

    // stage 3: drop docs whose distinct-shingle overlap with the bench
    // union reaches the threshold; docs too short to shingle cannot
    // overlap. Shingles come from the codegen'd ShingleExplode generator —
    // NOT the HOF array form, whose explode re-evaluates the shingle
    // array per emitted element (the O(tokens²) trap documented on
    // [[DedupOps.minhashPairs]]; measured 10× on this stage).
    val bs = bench
      .select(graft.functions.Generators.shingleExplode(col(textCol), w).as("s"))
      .distinct()
      .withColumn("__hit", lit(1))
    val ov = corpus
      .select(col(idCol).as("id"),
        graft.functions.Generators.shingleExplode(col(textCol), w).as("s"))
      .join(s2b.select(col("doc_id").as("id")), "id")
      .join(broadcast(bs), Seq("s"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_sh"), count(col("__hit")).as("n_ov"))
    val contaminated = ov
      .filter(col("n_ov") * maxOverlapDen >= col("n_sh") * maxOverlapNum)
      .select(col("id").as("doc_id"))
    val s3 = s2b.join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint()

    // stage 4: deterministic token budget over the survivors
    val s4 = SampleOps.budgetSample(s3, "doc_id", "n_tokens", budget)

    def stage(df: DataFrame, i: Int, name: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(i.toLong).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))

    val stages =
      Seq(("raw", masked), ("quality", s1), ("dedup", s2)) ++
        (if (ndBands > 0) Seq(("neardup", s2b)) else Nil) ++
        Seq(("decontaminated", s3), ("budget", s4))
    stages.zipWithIndex
      .map { case ((name, df), i) => stage(df, i, name) }
      .reduce(_ unionByName _)
      .orderBy("stage")
  }

  /** SPLIT-LEAKAGE check — the audit every train/eval split needs AFTER
    * near-dup analysis: a hash split ([[SampleOps.splitAssign]]) is
    * uniform over DOCUMENTS, but near-duplicate PAIRS do not respect it —
    * an eval doc whose near-twin sits in train is leaked supervision, and
    * exact-dedup-then-split does not prevent it (fuzzy twins survive
    * exact dedup). Counts verified MinHash near-dup pairs
    * ([[DedupOps.minhashVerifiedPairs]] — the complete pair set at
    * `minJaccard`, no top-K truncation) per unordered split pair: the
    * OFF-diagonal rows are the leak; `(eval, train)` > 0 means "dedup
    * ACROSS splits before freezing the benchmark".
    *
    * Output: (split_a ≤ split_b, n_pairs), ordered.
    *
    * 100 TB shape: the split assignment is one map-only hash expression
    * joined onto the pair relation by doc id twice (pairs are the
    * band-bucket-bounded LSH output, never n²); the final frame is
    * ≤ splits² rows. */
  def splitLeakage(
      docs: DataFrame, textCol: String, idCol: String,
      splits: Seq[(String, Long)], den: Long,
      w: Int, nBands: Int, r: Int, minJaccard: Double,
      maxBucket: Int = 1000): DataFrame = {
    val assigned = SampleOps.splitAssign(docs, idCol, splits, den)
      .select(col(idCol).as("__sid"), col("split"))
    DedupOps.minhashVerifiedPairs(docs, textCol, idCol, w, nBands, r,
        minJaccard, maxBucket)
      .join(assigned.select(col("__sid").as("doc_a"), col("split").as("__sa")), "doc_a")
      .join(assigned.select(col("__sid").as("doc_b"), col("split").as("__sb")), "doc_b")
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("split_a", "split_b")
  }
}

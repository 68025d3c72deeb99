package graft.ops

import graft.functions.Generators
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-size frequency sketches for corpus statistics at scale
  * (SURVEY.md §2.10 text analysis — at-scale companions to the exact
  * word-frequency path, cf. reference `main.py:457,512,543` Counter maps).
  *
  * A count-min sketch answers "roughly how often does each term occur?"
  * in `depth × width` integer cells REGARDLESS of corpus size: at 100 TB
  * the exact per-term groupBy still works (map-side combine), but its
  * output is vocabulary-sized, while the sketch's is a constant few KB
  * that can ride a broadcast, feed a stream, or merge across corpora by
  * cell-wise addition.
  *
  * Buckets are md5-derived hex prefixes (identical bytes in any engine —
  * the [[graft.functions.TextHash]] rationale), so the DuckDB oracle
  * reproduces every cell exactly: the sketch is integer sums over
  * deterministic buckets, nothing approximate about the COMPUTATION, only
  * about what a cell estimates.
  */
object SketchOps {

  /** Sketch bucket of `term` in row `r`: first `hexChars` hex chars of
    * md5("r:term") — 16^hexChars string-keyed buckets per row (hex compares
    * bytewise-identically cross-engine; no integer conversion needed). */
  private def bucket(row: Int, term: Column, hexChars: Int): Column =
    substring(md5(concat_ws(":", lit(row.toString), term)), 1, hexChars)

  /** One (row, bucket) struct per sketch row for `term`. Shared with the
    * streaming sketch ([[graft.streaming.StreamingOps]]) so batch and
    * stream cannot disagree on cell placement. */
  private[graft] def cells(term: Column, depth: Int, hexChars: Int): Column =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("row"), bucket(r, term, hexChars).as("bucket"))): _*))

  /** Build a `depth` × 16^`hexChars` count-min sketch over the token
    * stream of a corpus: `cnt(row, bucket)` = token instances hashing
    * there. The explode widens each token to `depth` cells, but map-side
    * combine collapses every partition to at most depth·16^hexChars rows
    * before the single shuffle — the output (and the shuffle) is
    * constant-sized however big the corpus. */
  def countMinSketch(docs: DataFrame, textCol: String, depth: Int, hexChars: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    require(hexChars >= 1 && hexChars <= 8, s"hexChars must be in [1, 8]: $hexChars")
    docs
      .filter(col(textCol).isNotNull)
      .select(Generators.ngramExplode(col(textCol), 1).as("term"))
      .select(cells(col("term"), depth, hexChars).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** HyperLogLog register file over the corpus token stream (Flajolet et
    * al. 2007) — the distinct-count companion to [[countMinSketch]]'s
    * frequency cells: "how many DISTINCT terms?" in 16^`bucketHex`
    * integer registers regardless of corpus size. Register j holds the
    * max rank (position of the highest set bit, counted from bit 60) of
    * any hashed term landing in bucket j — max is idempotent, so the
    * stream needs NO distinct pass, merges across corpora by cell-wise
    * max, and map-side combine collapses every partition to at most
    * 16^`bucketHex` rows before the single constant-sized shuffle.
    *
    * Hashing is md5-derived like the CMS (bucket = first `bucketHex` hex
    * chars; value = next 15 hex chars as a 60-bit BIGINT) and the rank is
    * read off the binary-string length (`61 - length(bin(v))`, an exact
    * integer both engines compute identically), so the register file is
    * bit-reproducible cross-engine — approximation lives only in what the
    * registers ESTIMATE ([[hllEstimate]]), never in the computation. */
  def hllRegisters(docs: DataFrame, textCol: String, bucketHex: Int): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(Generators.ngramExplode(col(textCol), 1).as("term"))
      .select(hllCell(col("term"), bucketHex).as("c"))
      .groupBy(col("c.bucket").as("bucket"))
      .agg(max(col("c.rho")).cast("long").as("register"))
      .orderBy("bucket")

  /** The (bucket, rho) HLL cell of one term — shared with the streaming
    * sketch so batch and stream cannot disagree on ranks. */
  private[graft] def hllCell(term: Column, bucketHex: Int): Column = {
    require(bucketHex >= 1 && bucketHex <= 3, s"bucketHex must be in [1, 3]: $bucketHex")
    val h = md5(term)
    val v = conv(substring(h, bucketHex + 1, 15), 16, 10).cast("long")
    struct(
      substring(h, 1, bucketHex).as("bucket"),
      when(v === 0, lit(61)).otherwise(lit(61) - length(bin(v))).as("rho"))
  }

  /** Per-group register files: one [[hllRegisters]] sketch per value of
    * `groupCol` (per-language / per-source distinct-vocabulary profiling).
    * Still ONE constant-bounded shuffle — at most groups × 16^`bucketHex`
    * rows survive the map-side combine; per-group estimates come from
    * [[hllEstimate]] applied per group, and group sketches roll up to the
    * corpus sketch by cell-wise max over the group axis. */
  def hllRegistersBy(
      docs: DataFrame, textCol: String, groupCol: String, bucketHex: Int): DataFrame =
    docs
      .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol),
        Generators.ngramExplode(col(textCol), 1).as("term"))
      .select(col(groupCol), hllCell(col("term"), bucketHex).as("c"))
      .groupBy(col(groupCol), col("c.bucket").as("bucket"))
      .agg(max(col("c.rho")).cast("long").as("register"))
      .orderBy(groupCol, "bucket")

  /** The cardinality estimate a register file encodes: the standard HLL
    * raw harmonic-mean formula with the small-range (linear-counting)
    * correction; buckets never hit count as register 0. One broadcast-
    * sized aggregate over at most 16^`bucketHex` rows — library surface
    * (estimates are doubles; the oracle-checked artifact is the register
    * file itself). */
  def hllEstimate(registers: DataFrame, bucketHex: Int): DataFrame = {
    val m = math.pow(16, bucketHex)
    val alpha = 0.7213 / (1 + 1.079 / m)
    registers.agg(
      count(lit(1)).as("nonzero"),
      sum(pow(lit(0.5), col("register"))).as("sumPresent"))
      .select(
        (lit(alpha * m * m) /
          (col("sumPresent") + (lit(m) - col("nonzero")))).as("raw"),
        col("nonzero"))
      .select(
        // linear counting below the 5m/2 threshold with empty buckets
        when(col("raw") <= 2.5 * m && col("nonzero") < m,
          lit(m) * log(lit(m) / (lit(m) - col("nonzero"))))
          .otherwise(col("raw")).as("estimate"),
        col("nonzero").cast("long").as("nonzero_buckets"))
  }

  /** Heavy hitters with their CMS estimates: probe the sketch for every
    * distinct term (est = min over rows of the probed cell — the CMS
    * guarantee is est >= true count, with equality unless every row
    * collides) and keep terms whose ESTIMATE reaches `minEst`. The true
    * count rides along so the overestimate is visible in the output.
    *
    * The sketch side is constant-sized and broadcast; the probe side is
    * one row per (distinct term × sketch row) — vocabulary-bounded, not
    * corpus-bounded. est >= true >= nothing-missed: CMS never
    * under-counts, so `est >= minEst` can only over-select, never lose a
    * true heavy hitter. */
  def cmsHeavyHitters(
      docs: DataFrame, textCol: String,
      depth: Int, hexChars: Int, minEst: Long): DataFrame = {
    val sketch = countMinSketch(docs, textCol, depth, hexChars)
    val truth = docs
      .filter(col(textCol).isNotNull)
      .select(Generators.ngramExplode(col(textCol), 1).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("true_cnt"))
    truth
      .select(col("term"), col("true_cnt"), cells(col("term"), depth, hexChars).as("p"))
      .join(broadcast(sketch),
        col("p.row") === col("row") && col("p.bucket") === col("bucket"))
      .groupBy("term", "true_cnt")
      .agg(min(col("cnt")).as("est"))
      .filter(col("est") >= minEst)
      .select(col("term"), col("est"), col("true_cnt"))
      .orderBy(col("est").desc, col("term").asc)
  }

  /** Frequent n-grams by the MISRA-GRIES two-pass route (Misra & Gries
    * 1982; the merge bound is Agarwal et al. PODS 2012) — the frequency
    * companion [[cmsHeavyHitters]] deliberately is NOT: the CMS path
    * still pays one VOCABULARY-sized exact-count shuffle to find its
    * candidates, which at 100 TB of n-grams is the cost being avoided.
    * Here no shuffle ever exceeds candidates × partitions rows:
    *
    * Pass 1 (map-only, bounded memory): each partition runs the classic
    * k-counter Misra-Gries stream summary over its n-gram occurrences —
    * increment a held term, admit below k, otherwise decrement ALL k
    * counters and discard the arrival (each such step retires k+1
    * occurrences, so decrements ≤ n_p/(k+1)) — and emits only its ≤ k
    * surviving candidate terms plus one sentinel row carrying the
    * partition's occurrence count. Any term with global count
    * c > n/(k+1) has c_p > n_p/(k+1) in SOME partition (else summing
    * the per-partition bounds contradicts the global one), and a term
    * over a partition's bound provably survives that partition's
    * summary — so the union of partition candidates contains EVERY
    * globally frequent term, whatever the partitioning.
    *
    * Pass 2 (exact, candidate-bounded): the n-gram stream inner-joins
    * the broadcast candidate set BEFORE its only shuffle (the BM25
    * semi-join-prune move — non-candidate occurrences never shuffle),
    * exact counts come off that bounded aggregate, and the final filter
    * `cnt·(k+1) > n` keeps exactly the terms over the frequency bound.
    * Because the guarantee makes candidates a SUPERSET of the answer at
    * any partitioning, the filtered output is deterministic even though
    * the intermediate candidate set is not — which is what lets a plain
    * exact-SQL oracle check a sketch-routed computation.
    *
    * Output: (term, cnt, share_ppm) — exact BIGINT count and integer
    * parts-per-million share, ordered by count desc. The boilerplate /
    * template-detection signal at n-gram granularity (the doc-internal
    * sibling is [[TextAnalysisOps.ngramNovelty]]; segment dedup STRIPS
    * what this op REPORTS).
    *
    * With `snapshot = true` (the safe default) both passes derive from
    * ONE materialized text projection (`localCheckpoint` of the filtered
    * text column), so the candidate-superset guarantee is STRUCTURAL —
    * the two scans cannot see different rows whatever the source (a
    * mutating view or a non-deterministic relation is snapshotted by
    * construction; r8 closed this by documentation only). The snapshot
    * costs one text-column materialization to executor block storage —
    * 1× the text, NOT the w× n-gram occurrence stream, but at 100 TB
    * that is still a corpus-sized copy per call. Callers reading
    * IMMUTABLE storage (static parquet — both scans provably see the
    * same rows already) pass `snapshot = false` and skip the copy
    * entirely: the two passes then re-scan the source, which columnar
    * pruning makes one text-column read each. Measured at sf0.1 (q119):
    * 1.29 s snapshotted (r9 committed bench) vs 0.90 s unsnapshotted
    * (min-of-5) — the parquet re-scan is CHEAPER than writing + reading
    * the block-storage copy, on top of the 100 TB storage-footprint
    * argument. */
  def frequentNgrams(docs: DataFrame, textCol: String, w: Int, k: Int,
      snapshot: Boolean = true): DataFrame = {
    require(w >= 1, s"ngram width must be >= 1: $w")
    require(k >= 1, s"summary size must be >= 1: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val proj = docs
      .filter(col(textCol).isNotNull)
      .select(col(textCol).as("__text"))
    val snap = if (snapshot) proj.localCheckpoint() else proj
    def ngrams = snap
      .select(Generators.ngramExplode(col("__text"), w).as("term"))
    val summary = ngrams.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      while (it.hasNext) {
        val t = it.next(); np += 1
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None =>
            m.mapValuesInPlace((_, v) => v - 1)
            m.filterInPlace((_, v) => v > 0)
        }
      }
      Iterator.single((null: String, np)) ++ m.keysIterator.map(t => (t, 0L))
    }.toDF("term", "np").localCheckpoint() // ≤ (k+1)·partitions rows; one pass-1 scan
    val total = summary.filter(col("term").isNull)
      .agg(sum(col("np")).cast("long").as("n"))
    val candidates = summary.filter(col("term").isNotNull).select("term").distinct()
    ngrams
      .join(broadcast(candidates), Seq("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("term"), col("cnt"),
        expr("cnt * 1000000 div n").as("share_ppm"))
      .orderBy(col("cnt").desc, col("term").asc)
  }

  /** PER-GROUP Misra-Gries heavy hitters: [[frequentNgrams]] with the
    * guarantee held INDEPENDENTLY per group (source / dump / language
    * shard) — the FineWeb-style per-dump boilerplate detector: a template
    * flooding one crawl dump is invisible in the global table when the
    * dump is 1% of the corpus, but dominates its own group's counters.
    * Same two-pass shape: pass 1 keeps k Misra-Gries counters PER GROUP
    * per partition (any term with per-group count > n_g/(k+1) must
    * survive in at least one partition — the superset argument applies
    * group-wise because decrements only fire on that group's rows),
    * pass 2 recounts candidates exactly and keeps `cnt·(k+1) > n_g`.
    * Both passes read one snapshot by default, so the superset guarantee
    * is structural; immutable-storage callers pass `snapshot = false`
    * and skip the corpus-sized copy (the [[frequentNgrams]] contract —
    * q157 at sf0.1: 1.31 s snapshotted vs 1.13 s unsnapshotted min-of-5).
    *
    * Output: (group, term, cnt, share_ppm) — exact counts, share of the
    * GROUP's n-gram mass, ordered (group, cnt desc, term).
    *
    * 100 TB shape: pass-1 state is ≤ (k+1)·groups·partitions rows
    * however big the corpus; candidates broadcast into the exact recount
    * (one (group, term)-keyed partial-agg shuffle); group totals ride a
    * broadcast join. */
  def frequentNgramsByGroup(
      docs: DataFrame, textCol: String, groupCol: String,
      w: Int, k: Int, snapshot: Boolean = true): DataFrame = {
    require(w >= 1, s"ngram width must be >= 1: $w")
    require(k >= 1, s"summary size must be >= 1: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val proj = docs
      .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"), col(textCol).as("__text"))
    val snap = if (snapshot) proj.localCheckpoint() else proj
    def ngrams = snap
      .select(col("__g"), Generators.ngramExplode(col("__text"), w).as("term"))
    val summary = ngrams.as[(String, String)].mapPartitions { it =>
      val maps = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.HashMap[String, Long]]
      val np = scala.collection.mutable.HashMap.empty[String, Long]
      while (it.hasNext) {
        val (g, t) = it.next()
        np.update(g, np.getOrElse(g, 0L) + 1)
        val m = maps.getOrElseUpdate(
          g, scala.collection.mutable.HashMap.empty[String, Long])
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None =>
            m.mapValuesInPlace((_, v) => v - 1)
            m.filterInPlace((_, v) => v > 0)
        }
      }
      np.iterator.map { case (g, c) => (g, null: String, c) } ++
        maps.iterator.flatMap { case (g, m) =>
          m.keysIterator.map(t => (g, t, 0L))
        }
    }.toDF("__g", "term", "np").localCheckpoint()
    val totals = summary.filter(col("term").isNull)
      .groupBy("__g").agg(sum(col("np")).cast("long").as("n"))
    val candidates = summary.filter(col("term").isNotNull)
      .select("__g", "term").distinct()
    ngrams
      .join(broadcast(candidates), Seq("__g", "term"))
      .groupBy("__g", "term")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("__g"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("__g").as(groupCol), col("term"), col("cnt"),
        expr("cnt * 1000000 div n").as("share_ppm"))
      .orderBy(col(groupCol), col("cnt").desc, col("term").asc)
  }

  /** Power-of-2 QUANTILE sketch over a non-negative integer metric — the
    * rank/quantile companion to [[countMinSketch]] (frequency) and
    * [[hllRegisters]] (cardinality): (bucket, cnt) where bucket is the
    * metric's BIT LENGTH (`length(bin(v))`; 0 → bucket 0), so bucket b ≥ 1
    * covers [2^(b-1), 2^b − 1] — a DDSketch (Masson et al., VLDB 2019)
    * with γ = 2, except the log is the exact integer bit length both
    * engines compute identically (a float log2 would put boundary values
    * in different buckets by a ulp). At most 64 rows however big the
    * corpus; map-side combine bounds the shuffle the same way; shards
    * merge by cell-wise ADD (counts are associative).
    *
    * [[RelationalOps.nearestRankBounds]] is the EXACT-quantile path —
    * its histogram is metric-cardinality-sized. This sketch is the
    * unbounded-cardinality fallback: constant size bought with factor-2
    * relative error on the value axis. Negative metrics are rejected by
    * filter (sign would need a second bucket axis). */
  def log2Histogram(df: DataFrame, metricCol: String): DataFrame =
    df.filter(col(metricCol).isNotNull && col(metricCol) >= 0)
      .select(log2Bucket(col(metricCol)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** The bit-length bucket of one metric value — shared with the
    * streaming windowed sketch ([[graft.streaming.StreamingOps]]) so
    * batch and stream bucket every value identically. */
  private[graft] def log2Bucket(metric: Column): Column =
    when(metric === 0, lit(0L))
      .otherwise(length(bin(metric)).cast("long"))

  /** Nearest-rank quantile PROBE of [[log2Histogram]]: for each percent p
    * the sketch bucket holding the rank-⌈p·n/100⌉ value, reported with
    * its exact integer value range [bucket_lo, bucket_hi] — the true
    * nearest-rank quantile provably lies inside it (spec-pinned against
    * the exact computation). Rank membership is the cross-multiplied
    * integer test `100·cum ≥ p·n` (⌈a/b⌉ ≤ c ⟺ a ≤ c·b) — no division
    * anywhere. The cumulative window runs over the ≤64-row sketch. */
  def log2QuantileProbe(
      df: DataFrame, metricCol: String, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty, "need at least one percent")
    percents.foreach(p => require(0 <= p && p <= 100, s"bad percent $p"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = log2Histogram(df, metricCol)
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(
        Window.orderBy(col("bucket")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    cum
      .select(col("bucket"), col("__cum"), col("__n"),
        explode(array(percents.map(p => lit(p.toLong)): _*)).as("percent"))
      .filter(col("__cum") * 100 >= col("__n") * col("percent"))
      .groupBy("percent")
      .agg(min(col("bucket")).as("bucket"))
      .select(col("percent"), col("bucket"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))"))
          .as("bucket_lo"),
        // Bucket 63 (metric ≥ 2^62): shiftleft(1, 63) wraps to Long.MinValue
        // and "- 1" lands on Long.MaxValue — correct only by two's-complement
        // coincidence, and the DuckDB mirror's `1 << 63` errors outright.
        // Clamp the top bucket explicitly on BOTH engines.
        when(col("bucket") === 0, lit(0L))
          .when(col("bucket") === 63, lit(Long.MaxValue))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1"))
          .as("bucket_hi"))
      .orderBy("percent")
  }

  /** PAIRWISE SOURCE VOCABULARY OVERLAP from per-group HLL register
    * files ([[hllRegistersBy]]) — "how much vocabulary do source A and
    * source B share?" without ever materializing either vocabulary:
    * the union sketch of a pair is the CELL-WISE MAX of the two register
    * files (the same idempotent merge that rolls shards up), and
    * inclusion–exclusion recovers the intersection,
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), with the Jaccard estimate
    * inter/union on top — the classic mixing-decision input (is src_b
    * mostly a re-crawl of src_a, or genuinely new text?).
    *
    * Estimates use the repo's cross-engine-exact harmonic form
    * ([[graft.ops.ProfileOps.columnDistinctEstimates]] precedent): the
    * order-free integer Σ 2^(61−register) in DECIMAL(38,0) (HUGEINT on
    * the oracle side), one pinned-order division, linear-counting
    * fallback, round 6 dp; intersection and Jaccard are then computed
    * from the ROUNDED estimates in one pinned operation order, so both
    * engines agree bit-for-bit. Intersection clamps at 0 — the
    * inclusion–exclusion error is relative to the UNION size, so
    * near-disjoint small sources can estimate slightly negative.
    *
    * 100 TB shape: ONE token-stream scan with map-side combine into at
    * most groups × 16^`bucketHex` register rows (the only shuffle);
    * the pair algebra (cross pairs, explode-membership equi-join,
    * cell-wise max, harmonic sums) runs on that metadata-sized relation
    * regardless of corpus size. G sources cost G·(G−1)/2 pair rows of
    * OUTPUT, not extra corpus passes. */
  def hllOverlap(
      docs: DataFrame, textCol: String, groupCol: String, bucketHex: Int): DataFrame = {
    require(bucketHex >= 1 && bucketHex <= 3, s"bucketHex must be in [1, 3]: $bucketHex")
    val m = math.pow(16, bucketHex)
    val mL = m.toLong
    val alpha = 0.7213 / (1 + 1.079 / m)
    val num = alpha * m * m * math.pow(2, 61)
    val two61 = lit(2305843009213693952L).cast("decimal(38,0)") // 2^61
    // estimate from the (nonzero, Σ 2^(61-reg)) harmonic stats — the
    // exact q118 operation order, shared by the per-group and union sides
    def est(nz: Column, sp: Column): Column = {
      val raw = lit(num) /
        (sp + (lit(mL) - nz).cast("decimal(38,0)") * two61).cast("double")
      round(
        when(raw <= lit(2.5 * m) && nz < mL,
          lit(m) * log(lit(m) / (lit(mL) - nz).cast("double")))
          .otherwise(raw), 6)
    }
    val harmSum = sum(expr(
      "CAST(shiftleft(1L, CAST(61 - register AS INT)) AS DECIMAL(38,0))"))
    val regs = hllRegistersBy(docs, textCol, groupCol, bucketHex)
      .withColumnRenamed(groupCol, "__g")
    val gStats = regs.groupBy(col("__g"))
      .agg(count(lit(1)).as("__nz"), harmSum.as("__sp"))
    val pairs = gStats.select(col("__g").as("source_a"),
        col("__nz").as("__nza"), col("__sp").as("__spa"))
      .join(gStats.select(col("__g").as("source_b"),
        col("__nz").as("__nzb"), col("__sp").as("__spb")),
        col("source_a") < col("source_b"))
    val unionStats = pairs.select(col("source_a"), col("source_b"),
        explode(array(col("source_a"), col("source_b"))).as("__g"))
      .join(regs, "__g")
      .groupBy(col("source_a"), col("source_b"), col("bucket"))
      .agg(max(col("register")).as("register"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("__nzu"), harmSum.as("__spu"))
    pairs.join(unionStats, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"),
        est(col("__nza"), col("__spa")).as("est_a"),
        est(col("__nzb"), col("__spb")).as("est_b"),
        est(col("__nzu"), col("__spu")).as("est_union"))
      .select(col("source_a"), col("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")), 6)
          .as("est_intersection"))
      .withColumn("jaccard_est",
        round(col("est_intersection") / col("est_union"), 6))
      .orderBy("source_a", "source_b")
  }
}

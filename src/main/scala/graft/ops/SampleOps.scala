package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mix construction.
  *
  * `df.sample()` draws from per-partition RNG streams, so the selected
  * rows change with seed AND physical partitioning — useless for
  * reproducible corpus mixes or cross-engine verification. These
  * operators derive every keep/order decision from md5 of a stable key:
  * the same rows fall out on any cluster layout, any engine (the DuckDB
  * oracle mirrors the same expressions verbatim).
  *
  * CONTRACT: `keyCol` must be UNIQUE per row (a document/record id).
  * [[hashSample]] and [[weightedMix]] only weaken gracefully (duplicate
  * keys keep or drop together), but [[stratifiedQuota]] and
  * [[packSequences]] order by (md5(key), key) — duplicate keys tie both
  * sort keys, and a tied window order is partition-dependent, which
  * forfeits exactly the determinism this module exists to provide.
  *
  * Properties that matter for corpus curation:
  *  - NESTING: `hashSample(num1/den)` ⊆ `hashSample(num2/den)` whenever
  *    num1 <= num2 — shrinking the fraction shrinks the sample in place,
  *    so a 1% / 10% / 100% scaling-law data ladder is three thresholds
  *    over ONE pass, each rung a strict subset of the next;
  *  - DISTRIBUTION over union: sampling commutes with unioning shards;
  *  - map-only: no shuffle, no state, pushes down past nothing it
  *    shouldn't (the filter is a plain deterministic predicate).
  */
object SampleOps {

  /** First 8 hex chars of md5(key) — lexicographic order on equal-length
    * lowercase hex IS numeric order on the 32-bit value, and Spark and
    * DuckDB both compare ASCII strings bytewise. */
  private def hashKey(k: Column): Column = substring(md5(k.cast("string")), 1, 8)

  /** The 8-hex-digit threshold under which a 32-bit hash falls with
    * probability num/den (exact integer arithmetic; num < den so the
    * result always fits 8 digits and string-compares correctly). */
  private[graft] def hexThreshold(num: Long, den: Long): String = {
    require(num >= 0 && den > 0 && num < den, s"fraction must be in [0, 1): $num/$den")
    f"${((BigInt(1) << 32) * num / den).toLong}%08x"
  }

  /** Deterministic Bernoulli-style sample: keep a row iff the md5 bucket
    * of its key falls under fraction num/den of the hash space.
    * num == den short-circuits to the full input. */
  def hashSample(df: DataFrame, keyCol: String, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"fraction must be in [0, 1]: $num/$den")
    if (num == den) df
    else df.filter(hashKey(col(keyCol)) < lit(hexThreshold(num, den)))
  }

  /** WEIGHTED PRIORITY SAMPLE — Efraimidis–Spirakis A-Res (Inf. Proc.
    * Lett. 2006) made deterministic: keep the top `n` rows by priority
    * `u^(1/w)` where `u` is the row's md5-derived uniform — inclusion
    * probability ∝ weight, so sampling docs with weight = token count
    * yields a token-mass-unbiased subsample where [[hashSample]]'s
    * unweighted keep would over-represent short docs. Reproducible
    * (same keys → same sample), monotone in n (growing the sample only
    * ADDS rows), and mergeable (the top-n of a union is the top-n of
    * per-shard top-ns — a distributed TakeOrdered, no global sort).
    *
    * The ranking key is ln(u)/w — monotone in the priority — computed as
    * ONE pinned double expression rounded ONCE to micro-int (the
    * zipfSlope/q103 micro-ln convention: a raw `ln` in an ORDER BY is a
    * cross-engine ulp hazard; rounded at 1e-6 both engines agree
    * bit-for-bit). Rows with null/non-positive weight drop.
    *
    * Output: (key, weight, priority_micro), (priority desc, key asc),
    * top n. */
  def weightedPrioritySample(
      df: DataFrame, keyCol: String, weightCol: String, n: Int): DataFrame = {
    require(n >= 1, s"bad n: $n")
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol), col(weightCol).cast("long").as("weight"),
        round(log((u + lit(0.5)) / lit(4294967296.0)) / col(weightCol).cast("long")
          * lit(1000000.0)).cast("long").as("priority_micro"))
      .orderBy(col("priority_micro").desc, col(keyCol).asc)
      .limit(n)
  }

  /** Weighted corpus mix: per-group sampling fractions applied in ONE
    * map-only pass — the "reweight sources for training" primitive (cap
    * web crawl at 30%, keep all code, …). Each group's fraction is its
    * own md5 threshold, looked up from a broadcast weights relation;
    * groups absent from `fractions` are DROPPED (explicit mix contract).
    * Inherits [[hashSample]]'s nesting: raising one source's fraction
    * only ADDS rows of that source, so mixes are monotonically tunable
    * without resampling the rest. */
  def weightedMix(
      df: DataFrame, groupCol: String, keyCol: String,
      fractions: Map[String, (Long, Long)]): DataFrame = {
    require(fractions.nonEmpty, "weightedMix needs at least one group fraction")
    val thresholds = fractions.toSeq.sortBy(_._1).map { case (g, (num, den)) =>
      require(num >= 0 && den > 0 && num <= den, s"fraction $num/$den for group $g")
      // num == den -> threshold above every 8-hex-digit hash (full keep)
      g -> (if (num == den) "g" else hexThreshold(num, den))
    }
    val thresholdOf = thresholds.tail.foldLeft(
      when(col(groupCol) === thresholds.head._1, lit(thresholds.head._2))) {
      case (acc, (g, t)) => acc.when(col(groupCol) === g, lit(t))
    }
    df.withColumn("__thr", thresholdOf)
      .filter(col("__thr").isNotNull && hashKey(col(keyCol)) < col("__thr"))
      .drop("__thr")
  }

  /** QUALITY-TIERED mix: bucket rows into quality tiers by nearest-rank
    * percentile cuts of an integer metric, then hash-sample each tier at
    * its own fraction — the "upsample the best decile, thin the tail"
    * curation move (cf. classifier-scored corpus tiers in web-scale
    * pipelines). Tier t of row r = how many cut bounds lie strictly below
    * r's metric (tier 0 = bottom slice, `cuts.length` = top); fraction t
    * applies to tier t. Returns the surviving rows plus a `tier` column.
    *
    * Bounds come from [[graft.ops.RelationalOps.nearestRankBounds]] —
    * integer-exact, no interpolated doubles anywhere near a membership
    * predicate (a ulp on the boundary would flip a row's TIER, changing
    * which fraction samples it). Selection inherits [[hashSample]]'s
    * determinism and nesting PER TIER: raising one tier's fraction only
    * adds rows of that tier.
    *
    * Scale shape: one bounded-histogram pass for the bounds (broadcast
    * back as one row), then one map-only filter over the corpus — no
    * shuffle on the data path, same as [[weightedMix]] but with the
    * group derived from the metric distribution instead of a column. */
  def tieredMix(
      df: DataFrame, metricCol: String, keyCol: String,
      cuts: Seq[Int], fractions: Seq[(Long, Long)]): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted && cuts.distinct == cuts,
      s"cuts must be strictly ascending percents: $cuts")
    require(fractions.length == cuts.length + 1,
      s"need ${cuts.length + 1} tier fractions (cuts.length + 1), got ${fractions.length}")
    val thresholds = fractions.map { case (num, den) =>
      require(num >= 0 && den > 0 && num <= den, s"fraction must be in [0, 1]: $num/$den")
      // num == den -> "g" sorts above every 8-hex-digit hash (full keep)
      if (num == den) "g" else hexThreshold(num, den)
    }
    val bounds = RelationalOps.nearestRankBounds(df, metricCol, cuts)
    val tier = cuts.indices
      .map(i => when(col(metricCol) > col(s"bound_$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val thrOf = thresholds.zipWithIndex.tail.foldLeft(
      when(col("tier") === 0L, lit(thresholds.head))) {
      case (acc, (t, i)) => acc.when(col("tier") === i.toLong, lit(t))
    }
    df.filter(col(metricCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("tier", tier)
      .filter(hashKey(col(keyCol)) < thrOf)
      .drop(cuts.indices.map(i => s"bound_$i"): _*)
  }

  /** Sequence PACKING plan: assign documents to fixed-token-budget bins
    * (context windows) under the concatenate-and-split model GPT-style
    * packers use — within a shard, documents are concatenated in
    * deterministic key order and a document's bin is the budget window
    * its START offset falls in (so a document may straddle the boundary
    * into its bin's tail, exactly like tokens crossing a context-window
    * split). Returns the input plus (bucket, bin) — callers group by them
    * to materialize packed sequences.
    *
    * Scale contract: packing is inherently sequential, so the GLOBAL
    * greedy order cannot be distributed; instead documents are first
    * spread across `nBuckets` md5 buckets and packed WITHIN each bucket
    * independently — the cumulative-sum window partitions by bucket
    * (parallel, bounded state), matching how production packers shard.
    * Deterministic: bucket and order both derive from md5(key). Fill
    * efficiency is within a doc of greedy-per-bucket; bin ids are
    * (bucket, bin-within-bucket) pairs. `tokenCol` is a precomputed
    * integer length — counting tokens is [[graft.ops.TextAnalysisOps]]'
    * job, packing composes downstream of it. */
  def packSequences(
      df: DataFrame, keyCol: String, tokenCol: String,
      budget: Long, nBuckets: Int): DataFrame = {
    require(budget >= 1, "token budget must be >= 1")
    require(nBuckets >= 1, "need at least one bucket")
    val bucket = pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bucket", bucket)
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      // the bin is how many full budgets the PRECEDING docs consumed:
      // ceil-free integer division of the exclusive running total
      .withColumn("bin", expr(s"(__cum - $tokenCol) DIV ${budget}"))
      .drop("__cum")
  }

  /** Token-BUDGET selection: keep rows in ascending (md5(key), key) order
    * while the running `tokenCol` total stays within `budget` — "the
    * first B tokens of the deterministically shuffled corpus", the
    * data-budget counterpart of [[hashSample]]'s rate ladder (same order,
    * so budget ladders NEST exactly like fraction ladders). Take-while
    * semantics: a row survives iff its INCLUSIVE running total is
    * <= budget; the straddling row is dropped. Appends `cum_tokens`.
    *
    * Scale contract: no global single-partition window. The sort key
    * begins with the first `bucketHex` hex chars of md5(key), so global
    * hash order = (bucket, within-bucket order): per-bucket token totals
    * (16^bucketHex rows, metadata-sized) produce exclusive bucket offsets
    * via one tiny window; the offsets broadcast back and every bucket
    * runs its own bounded cumulative window in parallel. Equality with
    * the naive single-window form is spec-pinned. */
  def budgetSample(
      df: DataFrame, keyCol: String, tokenCol: String,
      budget: Long, bucketHex: Int = 2): DataFrame = {
    require(budget >= 0, s"token budget must be >= 0: $budget")
    require(bucketHex >= 1 && bucketHex <= 8, s"bucketHex must be in [1, 8]: $bucketHex")
    val withB = df.withColumn("__bkt",
      substring(md5(col(keyCol).cast("string")), 1, bucketHex))
    // exclusive running total of the buckets BEFORE each bucket: at most
    // 16^bucketHex rows, through the shared triangle-join kernel (r8 —
    // was the one intentionally-tiny unpartitioned window)
    val offsets = RelationalOps.exclusivePrefixOffsets(
      withB.groupBy("__bkt").agg(sum(col(tokenCol)).as("__tot")), "__bkt")
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offsets), "__bkt")
      .withColumn("cum_tokens", col("__off") + sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__bkt", "__off")
  }

  /** Deterministic TRAIN/VAL/TEST split: each row's md5 hash position
    * assigns it to the split whose cumulative-fraction interval it falls
    * in — the "held-out sets must stay held out" primitive. Appends a
    * `split` column; map-only, no shuffle.
    *
    * `splits` lists (name, num) shares over a common `den`; shares must
    * be positive and sum to `den` (splits partition the corpus —
    * disjoint AND exhaustive by construction, every hash lands in
    * exactly one half-open interval).
    *
    * The property that makes hash-splitting the industry default: a
    * row's split depends only on its OWN key, so membership is stable
    * under corpus growth — new documents distribute across splits
    * without moving any existing document between splits (no test-set
    * leakage into training when the corpus is re-ingested). Boundary
    * monotonicity inherits from [[hashSample]]'s nesting: growing one
    * split's share only moves rows across the one boundary it shifts. */
  def splitAssign(
      df: DataFrame, keyCol: String, splits: Seq[(String, Long)], den: Long): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), s"split shares must be positive: $splits")
    require(splits.map(_._2).sum == den, s"shares must sum to $den: $splits")
    require(splits.map(_._1).distinct == splits.map(_._1), s"duplicate split names: $splits")
    // cumulative upper bounds; the last split takes the otherwise-branch
    // (covers hash == ffffffff, which no threshold can express)
    val cum = splits.init.scanLeft(0L) { case (acc, (_, n)) => acc + n }.tail
    val h = hashKey(col(keyCol))
    val splitExpr = splits.init.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val bound = lit(hexThreshold(c, den))
        Some(acc.fold(when(h < bound, name))(_.when(h < bound, name)))
    }.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split", splitExpr)
  }

  /** Per-group deterministic quota: up to `n` rows per group, chosen by
    * ascending (md5(key), key) — an unbiased, reproducible per-stratum
    * subsample; the "cap each source's contribution" mix primitive.
    * Appends a dense 1-based `rk` rank within the group.
    *
    * One shuffle on the group key. At 100 TB, groups can dwarf `n`; since
    * the quota keeps the n LOWEST hashes and [[hashSample]] keeps hashes
    * under a threshold, pre-filtering with `hashSample(keyCol, num, den)`
    * yields the IDENTICAL result as long as every group retains >= n
    * rows — a cheap map-side filter that shrinks the window's sort input
    * by den/num before the shuffle. */
  def stratifiedQuota(
      df: DataFrame, groupCol: String, keyCol: String, n: Int): DataFrame = {
    require(n >= 1, "quota must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
  }

  /** TEMPERATURE-scaled source weights for α = 1/2 — the multilingual /
    * multi-source rebalancing move (sample sources ∝ n^α instead of ∝ n,
    * so small sources are upweighted relative to their share; the
    * standard T=2 setting of the `p_s ∝ p̂_s^α` schedule LLM data mixes
    * use). The per-row keep RATE for source s works out to
    * sqrt(n_min/n_s): the smallest source keeps everything, a source 100×
    * larger keeps 1/10 — computed from the data itself, no hand-tuned
    * fraction map (that is [[weightedMix]]'s job).
    *
    * Exact-arithmetic form: rate_s = isqrt(n_min·n_s)/n_s, a RATIONAL
    * with integer numerator w_num = floor(sqrt(n_min·n_s)) — sqrt is
    * correctly rounded on every IEEE-754 engine and n_min·n_s < 2^52
    * keeps the long→double cast exact, so w_num is bit-identical on any
    * engine (and exactly isqrt below that bound). Returns one row per
    * source: (g, n, w_num). Metadata-sized: one count aggregate + a
    * single-row min joined back. */
  def temperatureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
    val nmin = counts.groupBy().agg(min(col("n")).as("__nmin"))
    counts.crossJoin(broadcast(nmin))
      .select(col("g"), col("n"),
        floor(sqrt((col("n") * col("__nmin")).cast("double"))).as("w_num"))
  }

  /** Temperature mix (α = 1/2): keep a row of source s iff its 32-bit md5
    * hash falls under rate_s = w_num_s/n_s of the hash space — the exact
    * integer comparison h·n_s < w_num_s·2^32 (both sides < 2^58, no
    * overflow, no double ever near the boundary). One metadata-sized
    * weight aggregate broadcast back, then one map-only filter: the same
    * scale shape as [[weightedMix]], with the fractions DERIVED from the
    * source-size distribution instead of supplied. Inherits
    * [[hashSample]]'s nesting per source. Rows with a null group are
    * dropped (explicit mix contract, as in [[weightedMix]]). */
  def temperatureMix(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val wt = temperatureWeights(df, groupCol)
    val h32 = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    df.join(broadcast(wt), df(groupCol) === wt("g"))
      .filter(h32 * col("n") < col("w_num") * lit(1L << 32))
      .drop("g", "n", "w_num")
  }

  /** Per-source profile of [[temperatureMix]] — the catalog/report form:
    * source size, its integer weight numerator, surviving count, and a
    * key checksum pinning the exact membership. */
  def temperatureMixProfile(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    // tiny (one row per source) and feeds both the filter join and the
    // reported n/w_num columns
    val wt = temperatureWeights(df, groupCol).localCheckpoint()
    val h32 = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    df.join(broadcast(wt), df(groupCol) === wt("g"))
      .filter(h32 * col("n") < col("w_num") * lit(1L << 32))
      .groupBy(col("g").as("source"))
      .agg(
        max(col("n")).as("n_docs"),
        max(col("w_num")).as("w_num"),
        count(lit(1)).as("n_kept"),
        sum(col(keyCol)).as("key_sum"))
      .orderBy("source")
  }

  /** MIXTURE PLAN: the PLANNING step in front of [[weightedMix]] /
    * [[temperatureMix]] — given target mixture weights (integer parts;
    * DoReMi/SlimPajama-style domain proportions) and a total token
    * budget, reconcile the plan against what each source actually HAS:
    * per source the available tokens, the quota
    * `budget·wᵢ div Σw`, the keep rate (ppm, capped at 10⁶ — a source
    * cannot be oversampled by a filter), the expected token yield, and
    * the DEFICIT where the quota exceeds availability (the number the
    * pipeline owner must re-weight or re-crawl to close). A weight row
    * naming a source the corpus lacks reports zero availability and a
    * full deficit rather than vanishing — mis-spelled source names
    * should be loud.
    *
    * Determinism: weights and budget are literals; availability is an
    * exact token-count aggregate; the keep rate is integer throughout —
    * the quota×10⁶ product runs in DECIMAL(38,0) (the anomalyDaily
    * precedent; BIGINT would overflow at 10¹³ available × 10⁶) with
    * truncating `div`, HUGEINT on the DuckDB side.
    *
    * 100 TB shape: one map-only corpus scan into a source-keyed partial
    * count; everything after is weight-list-sized. */
  def mixPlan(
      docs: DataFrame, textCol: String, groupCol: String,
      weights: Seq[(String, Long)], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    require(weights.map(_._1).distinct == weights.map(_._1),
      s"duplicate source in weights: $weights")
    require(budgetTokens > 0, s"bad budget: $budgetTokens")
    val wSum = weights.map(_._2).sum
    val wRel = docs.sparkSession.range(1).select(
      explode(array(weights.map { case (g, w) =>
        struct(lit(g).as("g"), lit(w).as("w"))
      }: _*)).as("e"))
      .select(col("e.g").as("g"), col("e.w").as("w"))
    val avail = docs
      .filter(col(textCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(sum(size(graft.functions.TextHash.tokens(col(textCol))).cast("long"))
        .as("avail"))
    wRel.join(avail, Seq("g"), "left")
      .select(col("g").as(groupCol), col("w").as("weight"),
        coalesce(col("avail"), lit(0L)).as("n_tokens_available"),
        expr(s"$budgetTokens * w div $wSum").as("target_tokens"))
      .select(col(groupCol), col("weight"), col("n_tokens_available"),
        col("target_tokens"),
        when(col("n_tokens_available") === 0L, lit(0L))
          .when(col("target_tokens") >= col("n_tokens_available"), lit(1000000L))
          .otherwise(expr(
            "CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000000 div n_tokens_available AS BIGINT)"))
          .as("keep_ppm"),
        least(col("n_tokens_available"), col("target_tokens"))
          .as("expected_tokens"),
        greatest(lit(0L), col("target_tokens") - col("n_tokens_available"))
          .as("deficit_tokens"))
      .orderBy(col(groupCol))
  }

  /** TRUNCATION/PADDING WASTE report — the context-length decision input
    * that sits next to [[packSequences]]: under the SIMPLE packing policy
    * (one doc per sequence, truncate past W, pad short of W), how much of
    * every candidate window W is real signal? Per (window, group):
    * docs, raw tokens, kept tokens Σ min(t, W), truncated overflow
    * Σ max(0, t−W), pad filler n_docs·W − kept, and utilization
    * `kept·10⁶ div (n_docs·W)` (ppm, DECIMAL(38,0) product — the mixPlan
    * overflow rationale). Reading the report across the W ladder shows
    * exactly where padding waste crosses truncation loss — the number
    * that decides whether concatenate-and-split packing is worth its
    * attention-boundary cost.
    *
    * 100 TB shape: ONE map-only scan (token count per doc), an
    * |windows|-way explode of two-integer rows, and a group-by on
    * |windows|·|groups| keys — map-side combine collapses everything
    * before the constant-sized shuffle. */
  def truncationWaste(
      docs: DataFrame, textCol: String, groupCol: String,
      windows: Seq[Int]): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ > 0), s"bad windows: $windows")
    require(windows.distinct == windows, s"duplicate windows: $windows")
    docs
      .filter(col(textCol).isNotNull)
      .select(col(groupCol),
        size(graft.functions.TextHash.tokens(col(textCol))).cast("long").as("__t"),
        explode(array(windows.map(w => lit(w.toLong)): _*)).as("ctx_window"))
      .groupBy(col("ctx_window"), col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        sum(least(col("__t"), col("ctx_window"))).as("kept_tokens"),
        sum(greatest(lit(0L), col("__t") - col("ctx_window"))).as("truncated_tokens"))
      .select(col("ctx_window"), col(groupCol), col("n_docs"), col("n_tokens"),
        col("kept_tokens"), col("truncated_tokens"),
        (col("n_docs") * col("ctx_window") - col("kept_tokens")).as("pad_tokens"),
        expr("CAST(CAST(kept_tokens AS DECIMAL(38,0)) * 1000000 div (n_docs * ctx_window) AS BIGINT)")
          .as("utilization_ppm"))
      .orderBy(col("ctx_window"), col(groupCol))
  }
}

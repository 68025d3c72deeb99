package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WORDPIECE tokenizer training — the third production tokenizer family
  * next to [[BpeOps]] (greedy count-argmax merges) and [[UnigramLmOps]]
  * (EM-pruned piece LM): BPE's merge loop with BERT's LIKELIHOOD
  * selection rule (Schuster & Nakajima 2012; Wu et al. 2016 §4.1 — the
  * merge that maximizes p(lr)/(p(l)·p(r)), i.e. the language-model
  * likelihood gain of fusing the pair, not its raw frequency; a pair of
  * two already-frequent symbols must beat a higher bar than a pair of
  * rare ones). Symbols carry the standard `##` continuation convention:
  * round-0 symbolizes a word as first char plain + every later char
  * `##`-prefixed, and a merge concatenates the left symbol with the
  * right's unprefixed text — so initial and continuation subwords are
  * distinct symbols end to end, exactly the distinction the shipped
  * BERT vocabularies encode. (Degenerate corner, kept cross-engine
  * deterministic rather than forbidden: a literal '#' character in a
  * word produces symbols like `###`, whose stripped text concatenates
  * the same way in both engines.)
  *
  * Cross-engine determinism (the catalog's integer contract): the
  * selection score is INTEGER MICRO-likelihood
  * `pair_count · 10¹² div (left_count · right_count)` — both engines
  * compute the same BIGINT division and break ties (score, then pair
  * lexicographic) identically, so the learned merge sequence is exact
  * integer arithmetic. Counts are corpus token masses:
  * `pair_count · 10¹² < 2⁶³` holds through ~9·10⁶ corpus tokens; past
  * that, rescale the corpus pass or widen to DECIMAL (documented bound,
  * the q180 convention).
  *
  * 100 TB shape (the [[BpeOps]] story): the corpus collapses ONCE to the
  * (word, count) table; each round is two vocabulary-bounded aggregates
  * (symbol counts + pair counts), two vocabulary-keyed joins and ONE
  * bounded driver collect (the argmax row — the k-means/BPE driver-state
  * contract); inference is map-only over the corpus with the bounded
  * merge table riding the closure behind a per-thread memo.
  *
  * Reference scope: the reference (`/root/reference/main.py`) ships no
  * tokenizer; this family extends the engine for LLM-pipeline use, the
  * SURVEY §2-and-beyond contract.
  */
object WordPieceOps {

  /** Round-0 WordPiece symbolization: first char plain, every
    * continuation char `##`-prefixed. */
  private def charSymsWp(word: Column): Column =
    transform(sequence(lit(1), length(word)), i =>
      when(i === 1, word.substr(i, lit(1)))
        .otherwise(concat(lit("##"), word.substr(i, lit(1)))))

  /** Adjacent-pair explode over a symbol array (empty for single-symbol
    * words — sequence() would count DOWN on a negative span). */
  private def pairsOf(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2), i =>
        struct(element_at(syms, i + 1).as("left_sym"),
          element_at(syms, i + 2).as("right_sym"))))
      .otherwise(array().cast("array<struct<left_sym:string,right_sym:string>>"))

  private[graft] def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** The merged symbol: left text + right's unprefixed text (keeps the
    * left's initial/continuation status — the `##` bookkeeping rule). */
  private[graft] def mergedSym(l: String, r: String): String = l + stripCont(r)

  /** Greedy left-to-right non-overlapping application of ONE merge —
    * [[BpeOps.applyMerge]] with the WordPiece merged-symbol rule. */
  private[graft] def applyMergeWp(
      syms: Seq[String], l: String, r: String): Seq[String] = {
    val m = mergedSym(l, r)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += m; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Scored adjacent-pair candidates of one symbolized (syms, wc) word
    * table: pair count, both symbols' occurrence counts, and the
    * integer micro-likelihood selection score. All relations are
    * vocabulary-bounded; the two count joins are small-side joins the
    * optimizer broadcasts. */
  private def scoredPairs(words: DataFrame): DataFrame = {
    val sc = words
      .select(explode(col("syms")).as("sym"), col("wc"))
      .groupBy(col("sym"))
      .agg(sum(col("wc")).as("c"))
    words
      .select(explode(pairsOf(col("syms"))).as("p"), col("wc"))
      .groupBy(col("p.left_sym").as("left_sym"), col("p.right_sym").as("right_sym"))
      .agg(sum(col("wc")).as("pair_count"))
      .join(sc.select(col("sym").as("left_sym"), col("c").as("left_count")), "left_sym")
      .join(sc.select(col("sym").as("right_sym"), col("c").as("right_count")), "right_sym")
      .select(col("left_sym"), col("right_sym"), col("pair_count"),
        col("left_count"), col("right_count"),
        expr("pair_count * 1000000000000 div (left_count * right_count)")
          .as("score_micro"))
  }

  /** WordPiece training round 1's scored candidate table over the raw
    * corpus — the oracle-expressible step (the [[BpeOps
    * .adjacentPairCounts]] convention), totally ordered by the training
    * loop's exact selection order. */
  def wordpiecePairScores(docs: DataFrame, textCol: String, n: Int): DataFrame =
    scoredPairs(
      BpeOps.wordCounts(docs, textCol)
        .select(charSymsWp(col("word")).as("syms"), col("wc")))
      .orderBy(col("score_micro").desc, col("left_sym").asc, col("right_sym").asc)
      .limit(n)

  /** WORDPIECE TRAIN: learn `rounds` merges. Returns the learned table
    * (round, left_sym, right_sym, merged_sym, pair_count, score_micro)
    * in learned order — the artifact a WordPiece tokenizer ships. Stops
    * early if no pair remains. */
  def wordpieceTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bad rounds: $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeUdf = udf((syms: Seq[String], l: String, r: String) =>
      applyMergeWp(syms, l, r))
    var words = BpeOps.wordCounts(docs, textCol)
      .select(charSymsWp(col("word")).as("syms"), col("wc"))
      .localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val top = scoredPairs(words)
        .orderBy(col("score_micro").desc, col("left_sym").asc, col("right_sym").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((round, l, r, mergedSym(l, r), top(0).getLong(2), top(0).getLong(5)))
        words = words
          .select(mergeUdf(col("syms"), lit(l), lit(r)).as("syms"), col("wc"))
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
      .toDF("round", "left_sym", "right_sym", "merged_sym", "pair_count", "score_micro")
  }

  /** Symbol count of one word under the whole learned merge list — the
    * inference kernel ([[BpeOps.mergedSymbolCount]] with the WordPiece
    * round-0 symbolization and merged-symbol rule): symbols live in one
    * reused array, each merge compacts it in place. */
  private[graft] def wpSymbolCount(
      word: String, merges: IndexedSeq[(String, String)]): Int = {
    var n = word.length
    if (n == 0) return 0
    val arr = new Array[String](n)
    arr(0) = String.valueOf(word.charAt(0))
    var i = 1
    while (i < n) { arr(i) = "##" + word.charAt(i); i += 1 }
    if (n <= 1 || merges.isEmpty) return n
    var m = 0
    while (m < merges.length && n > 1) {
      val l = merges(m)._1; val r = merges(m)._2
      val fused = mergedSym(l, r)
      var w = 0; var j = 0
      while (j < n) {
        if (j < n - 1 && arr(j) == l && arr(j + 1) == r) {
          arr(w) = fused; j += 2
        } else { arr(w) = arr(j); j += 1 }
        w += 1
      }
      n = w; m += 1
    }
    n
  }

  /** Per-thread word→token-count memo — the [[BpeOps.MergeMemo]]
    * contract (Zipf head cached, tail recomputed; keyed by merge-table
    * instance, re-keyed on content match, reset on a different table). */
  private object WpMemo {
    private val MemoCap = 1 << 17
    private val tl =
      new ThreadLocal[(IndexedSeq[(String, String)], java.util.HashMap[String, Integer])]
    def count(word: String, ms: IndexedSeq[(String, String)]): Int = {
      var st = tl.get()
      if (st == null || !(st._1 eq ms)) {
        st = if (st != null && st._1 == ms) (ms, st._2)
          else (ms, new java.util.HashMap[String, Integer]())
        tl.set(st)
      }
      val hit = st._2.get(word)
      if (hit != null) hit.intValue()
      else {
        val v = wpSymbolCount(word, ms)
        if (st._2.size < MemoCap) st._2.put(word, v)
        v
      }
    }
  }

  /** WORDPIECE FERTILITY per group under the TRAINED merge table —
    * train-then-measure in one query (the q188 shape): tokens per
    * whitespace word and chars per token in integer ppm, the
    * cross-language tokenizer-equity metric. Training's bounded
    * word-table passes run first; the corpus encode is then ONE map-only
    * scan with the frozen merge list in the closure. */
  def wordpieceFertility(
      docs: DataFrame, textCol: String, groupCol: String, rounds: Int): DataFrame = {
    val ms: IndexedSeq[(String, String)] =
      wordpieceTrain(docs, textCol, rounds)
        .orderBy(col("round"))
        .select("left_sym", "right_sym").collect()
        .map(r => (r.getString(0), r.getString(1))).toIndexedSeq
    val stats = udf((text: String) => {
      val words = text.trim.split(" +").filter(_.nonEmpty)
      var nw = 0L; var nc = 0L; var nt = 0L
      words.foreach { w =>
        nw += 1; nc += w.length
        nt += WpMemo.count(w, ms)
      }
      (nw, nc, nt)
    })
    docs
      .filter(col(textCol).isNotNull)
      .select(col(groupCol), stats(col(textCol)).as("s"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("s._1")).as("n_words"),
        sum(col("s._2")).as("n_chars"), sum(col("s._3")).as("n_wp_tokens"))
      .select(col(groupCol), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_wp_tokens"),
        when(col("n_words") > 0,
          expr("n_wp_tokens * 1000000 div n_words")).as("tokens_per_word_ppm"),
        when(col("n_wp_tokens") > 0,
          expr("n_chars * 1000000 div n_wp_tokens")).as("chars_per_token_ppm"))
      .orderBy(col(groupCol))
  }
}

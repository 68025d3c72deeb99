package graft.sql

/** DuckDB oracle SQL mirroring [[graft.ops.BpeOps]]' oracle-expressible
  * step: the round-1 adjacent character-pair candidate table. (The
  * iterative merge loop itself is driver-coordinated and spec-pinned on a
  * closed-form fixture instead — single-statement SQL cannot express the
  * data-dependent per-round merge rewrite.) */
object BpeSql {

  private val toks = "list_filter(string_split_regex(trim(text), ' +'), x -> x <> '')"

  /** Mirror of wordCounts → adjacentPairCounts → top `n`: per adjacent
    * character pair, the word-count-weighted occurrence total. */
  def topPairCounts(table: String, n: Int): String =
    s"""WITH t AS (SELECT unnest($toks) AS w FROM $table WHERE text IS NOT NULL),
wc AS (SELECT w, COUNT(*) AS wc FROM t GROUP BY w),
p AS (SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym, wc
  FROM (SELECT w, wc, unnest(range(1, length(w))) AS i FROM wc WHERE length(w) >= 2)),
g AS (SELECT left_sym, right_sym, CAST(SUM(wc) AS BIGINT) AS pair_count
  FROM p GROUP BY left_sym, right_sym)
SELECT left_sym, right_sym, pair_count FROM g
ORDER BY pair_count DESC, left_sym ASC, right_sym ASC LIMIT $n"""
}

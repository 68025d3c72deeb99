package graft.sql

/** DuckDB oracle SQL mirroring [[graft.ops.RetrievalOps]]. Same whitespace
  * tokenization as the rest of the catalog; BM25 per-term contributions are
  * rounded to micro-units and summed as BIGINT so the score is an exact
  * integer in both engines (float-sum-order immune). */
object RetrievalSql {

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"
  private val toks = "list_filter(string_split_regex(trim(text), ' +'), x -> x <> '')"

  /** Mirror of [[graft.ops.RetrievalOps.hybridSearch]]: document-derived
    * BM25 query terms (self excluded before ranking), brute-force cosine
    * semantic side, exact-integer RRF fusion over the full outer join of
    * the two top-`kEach` rankings. */
  def hybridSearch(table: String, embTable: String,
      queryMod: Int, kEach: Int, kRrf: Int, k: Int, dim: Int,
      maxQueryTerms: Int = 0,
      k1: Double = 1.2, b: Double = 0.75): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x[i] * $y[i]))"
    val cos = s"round(${dot("cq.qv", "e.v")} / (sqrt(${dot("cq.qv", "cq.qv")}) * sqrt(${dot("e.v", "e.v")})), 6)"
    // Lucene-MLT term pruning: keep each query's maxQueryTerms RAREST
    // terms by corpus TOTAL frequency (tfreq asc, term asc) — the same
    // vocabulary-keyed rarity pass the engine runs; tf then covers only
    // the selected terms' postings
    val qsel =
      if (maxQueryTerms == 0) "q AS (SELECT query_id, term FROM q0)"
      else s"""fr AS (SELECT term, COUNT(*) AS tfreq FROM t GROUP BY term),
q AS (SELECT query_id, term FROM (
  SELECT q0.query_id, q0.term,
    ROW_NUMBER() OVER (PARTITION BY q0.query_id ORDER BY fr.tfreq ASC, q0.term ASC) AS trk
  FROM q0 JOIN fr USING (term)) WHERE trk <= $maxQueryTerms)"""
    s"""WITH t AS (SELECT doc_id, unnest($toks) AS term FROM $table WHERE text IS NOT NULL),
q0 AS (SELECT DISTINCT doc_id AS query_id, term FROM t WHERE doc_id % $queryMod = 0),
$qsel,
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
contrib AS (SELECT q.query_id, tf.doc_id,
  CAST(round(
    ln(1 + (corpus.n_docs - df.df_docs + 0.5) / (df.df_docs + 0.5))
    * (tf.tf * ($k1 + 1.0))
    / (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / corpus.avgdl))
    * 1e6) AS BIGINT) AS contrib_micro
  FROM tf JOIN q USING (term) JOIN df USING (term)
    JOIN dl USING (doc_id) CROSS JOIN corpus
  WHERE q.query_id <> tf.doc_id),
sc AS (SELECT query_id, doc_id, CAST(SUM(contrib_micro) AS BIGINT) AS score_micro
  FROM contrib GROUP BY query_id, doc_id),
lex AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
  ORDER BY score_micro DESC, doc_id ASC) AS rk FROM sc),
lexk AS (SELECT query_id, doc_id, rk FROM lex WHERE rk <= $kEach),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embTable),
cq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % $queryMod = 0),
cc AS (SELECT cq.query_id, e.vec_id AS doc_id, $cos AS cos
  FROM cq JOIN e ON e.vec_id <> cq.query_id),
sem AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
  ORDER BY cos DESC, doc_id ASC) AS rk FROM cc),
semk AS (SELECT query_id, doc_id, rk FROM sem WHERE rk <= $kEach),
f AS (SELECT COALESCE(l.query_id, s.query_id) AS query_id,
    COALESCE(l.doc_id, s.doc_id) AS doc_id,
    COALESCE(1000000 // ($kRrf + l.rk), 0) + COALESCE(1000000 // ($kRrf + s.rk), 0) AS rrf_e6
  FROM lexk l FULL OUTER JOIN semk s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
  ORDER BY rrf_e6 DESC, doc_id ASC) AS rk FROM f)
SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, CAST(rrf_e6 AS BIGINT) AS rrf_e6
FROM r WHERE rk <= $k ORDER BY query_id, rk"""
  }

  /** Mirror of [[graft.ops.RetrievalOps.invertedIndexStats]]. */
  def invertedIndexStats(table: String, minDf: Int): String =
    s"""WITH t AS (SELECT doc_id, unnest($toks) AS term FROM $table WHERE text IS NOT NULL),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term)
SELECT term,
  CAST(COUNT(*) AS BIGINT) AS df_docs,
  CAST(SUM(tf) AS BIGINT) AS total_tf,
  CAST(MAX(tf) AS BIGINT) AS max_tf,
  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
  CAST(MAX(doc_id) AS BIGINT) AS max_doc,
  CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM tf GROUP BY term HAVING COUNT(*) >= $minDf ORDER BY term"""

  /** Mirror of [[graft.ops.RetrievalOps.bm25TopK]]: identical idf/tf-norm
    * formulas, per-term `round(x * 1e6)` to BIGINT before the cross-term
    * sum, ranking on the exact integer score with doc_id tiebreak. */
  def bm25TopK(table: String, queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val qrows = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => s"(${sq(qid)}, ${sq(t)})") }
      .mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $qrows),
t AS (SELECT doc_id, unnest($toks) AS term FROM $table WHERE text IS NOT NULL),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
contrib AS (SELECT q.query_id, tf.doc_id,
  CAST(round(
    ln(1 + (corpus.n_docs - df.df_docs + 0.5) / (df.df_docs + 0.5))
    * (tf.tf * ($k1 + 1.0))
    / (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / corpus.avgdl))
    * 1e6) AS BIGINT) AS contrib_micro
  FROM tf JOIN q USING (term) JOIN df USING (term)
    JOIN dl USING (doc_id) CROSS JOIN corpus),
s AS (SELECT query_id, doc_id,
  CAST(SUM(contrib_micro) AS BIGINT) AS score_micro,
  CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM contrib GROUP BY query_id, doc_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
  ORDER BY score_micro DESC, doc_id ASC) AS rk FROM s)
SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, score_micro, n_terms_hit
FROM r WHERE rk <= $k ORDER BY query_id, rk"""
  }
}

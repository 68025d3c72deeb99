package graft.sql

import graft.ops.SimilarityOps

/** DuckDB oracle SQL for the similarity family — mirrors
  * [[graft.ops.SimilarityOps]]: float components cast to double before any
  * arithmetic; the SAME hyperplane literals the Spark plan inlines are
  * inlined here (via [[SimilarityOps.hyperplanes]]), so the two engines
  * cannot diverge on plane generation. */
object SimilaritySql {

  /** cosine(a, b) rounded to 6 dp over 1-indexed DOUBLE[] columns. */
  private def cosSql(a: String, b: String, dim: Int): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x[i] * $y[i]))"
    s"round(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})), 6)"
  }

  def annBruteForce(table: String, queryMod: Int, k: Int, dim: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $table),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % $queryMod = 0),
cand AS (SELECT q.query_id, e.vec_id AS neighbor_id, ${cosSql("q.qv", "e.v", dim)} AS cos
  FROM q JOIN e ON e.vec_id <> q.query_id),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk FROM cand)
SELECT query_id, neighbor_id, cos, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= $k ORDER BY query_id, rk"""

  def annLsh(table: String, queryMod: Int, k: Int, nPlanes: Int, dim: Int): String = {
    val planes = SimilarityOps.hyperplanes(nPlanes, dim)
    val planeValues = planes.zipWithIndex
      .map { case (h, p) => s"($p, [${h.mkString(", ")}]::DOUBLE[])" }
      .mkString(", ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $table),
b AS (SELECT e.vec_id, e.v,
  CAST(SUM(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), i -> e.v[i] * p.h[i])) > 0
    THEN (1::BIGINT << p.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM e, (VALUES $planeValues) AS p(p, h) GROUP BY e.vec_id, e.v),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id % $queryMod = 0),
cand AS (SELECT q.query_id, b.vec_id AS neighbor_id, ${cosSql("q.qv", "b.v", dim)} AS cos
  FROM q JOIN b ON b.bucket = q.bucket AND b.vec_id <> q.query_id),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk FROM cand)
SELECT query_id, neighbor_id, cos, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= $k ORDER BY query_id, rk"""
  }

  def labelCentroidProfile(table: String): String =
    s"""SELECT label, COUNT(*) AS n_vecs,
round(CAST(SUM(CAST(embedding[1]::DOUBLE AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS mean_d0,
round(CAST(SUM(CAST(embedding[2]::DOUBLE AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS mean_d1
FROM $table GROUP BY label ORDER BY label"""
}

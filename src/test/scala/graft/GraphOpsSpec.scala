package graft

import graft.ops.GraphOps
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent local simulation of the documented integer recurrence. */
  private def simulate(pairs: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L, dampNum: Long = 85L, dampDen: Long = 100L): Map[Long, Long] = {
    val edges = (pairs.map(p => (p._1, p._2)) ++ pairs.map(p => (p._2, p._1))).distinct
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val base = scale * (dampDen - dampNum) / dampDen
    var rank = deg.keys.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = in.map { case (n, s) => n -> (base + dampNum * s / dampDen) }
    }
    rank
  }

  test("pageRank matches an independent simulation of the integer recurrence") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 1L))
    val got = GraphOps.pageRankSymmetric(
      pairs.toDF("a", "b"), "a", "b", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == simulate(pairs, iters = 4))
  }

  test("star graph: the hub out-ranks every leaf, leaves tie exactly") {
    import spark.implicits._
    val star = (1L to 6L).map(i => (0L, i))
    val rows = GraphOps.pageRankSymmetric(star.toDF("a", "b"), "a", "b", iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hub = rows.find(_._1 == 0L).get
    val leaves = rows.filter(_._1 != 0L)
    assert(hub._3 == 6L && leaves.forall(_._3 == 1L))
    assert(leaves.forall(_._2 < hub._2))
    assert(leaves.map(_._2).distinct.length == 1, "symmetric leaves must tie bit-exactly")
  }

  test("ranks are deterministic across repartitionings") {
    import spark.implicits._
    val pairs = (1L to 40L).map(i => (i, i % 7))
    val a = GraphOps.pageRankSymmetric(pairs.toDF("a", "b"), "a", "b", iters = 3)
      .collect().toSeq
    val b = GraphOps.pageRankSymmetric(pairs.toDF("a", "b").repartition(11), "a", "b", iters = 3)
      .collect().toSeq
    assert(a == b)
  }

  test("rank mass is conserved up to geometrically-bounded truncation loss") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L))
    val rows = GraphOps.pageRankSymmetric(pairs.toDF("a", "b"), "a", "b", iters = 5)
      .collect().map(_.getLong(1))
    val n = rows.length.toLong
    val total = rows.sum
    // per round ≤ 2n units truncate away; the damped recurrence caps the
    // steady-state deficit at (2n)·dampDen/(dampDen−dampNum) ≈ 13n
    assert(total <= n * 1000000L)
    assert(total >= n * 1000000L - 100 * n, s"lost too much mass: $total")
  }

  test("triangle counts: K4 minus an edge, stars are triangle-free, edges canonicalize") {
    import spark.implicits._
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    // Edges deliberately reversed/duplicated to exercise canonicalization;
    // star 5-(6,7,8) closes nothing.
    val pairs = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L), (2L, 4L),
      (5L, 6L), (7L, 5L), (5L, 8L))
      .toDF("a", "b")
    val out = GraphOps.triangleCounts(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"got $out")
    // determinism under repartitioning
    val again = GraphOps.triangleCounts(pairs.repartition(7), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }
}

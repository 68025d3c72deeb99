package graft

import graft.ScaleBench.Point
import org.scalatest.funsuite.AnyFunSuite

class ScaleBenchSpec extends AnyFunSuite {

  test("linear growth with a fixed per-job floor is not flagged") {
    // classic linear query: 0.25 s floor + b·rows; the top-pair time ratio
    // (0.80/0.30 ≈ 2.7) sits far under the rows ratio (10)
    val pts = Map("q_linear" -> Seq(
      Point(60_000L, 0.28), Point(600_000L, 0.30), Point(6_000_000L, 0.80)))
    assert(ScaleBench.flagSuperlinear(pts).isEmpty)
  }

  test("exactly-proportional growth is not flagged under the default allowance") {
    val pts = Map("q_prop" -> Seq(
      Point(600_000L, 0.6), Point(6_000_000L, 6.0)))
    assert(ScaleBench.flagSuperlinear(pts).isEmpty)
  }

  test("a quadratic term that dominates at the top point is flagged with its excess") {
    // time ratio 20/0.5 = 40 vs rows ratio 10 → excess 4.0 > allowance 1.5
    val pts = Map(
      "q_quadratic" -> Seq(
        Point(60_000L, 0.30), Point(600_000L, 0.50), Point(6_000_000L, 20.0)),
      "q_linear" -> Seq(
        Point(60_000L, 0.28), Point(600_000L, 0.30), Point(6_000_000L, 0.80)))
    val flagged = ScaleBench.flagSuperlinear(pts)
    assert(flagged.map(_._1) == Seq("q_quadratic"))
    assert(math.abs(flagged.head._2 - 4.0) < 1e-9)
  }

  test("noise-floor: a sub-floor top measurement is never flagged") {
    // 0.05 → 0.45 s would be a 9x/10 = 0.9 excess anyway, but even an
    // extreme-looking ratio below the floor is job-launch noise
    val pts = Map("q_tiny" -> Seq(
      Point(600_000L, 0.01), Point(6_000_000L, 0.40)))
    assert(ScaleBench.flagSuperlinear(pts).isEmpty)
  }

  test("small-point times are guarded by the per-job floor before ratioing") {
    // t1 = 5 ms is not a real measurement; guarding at 0.05 s keeps a
    // 0.005 → 0.6 s pair (ratio 120) from flagging a linear query . . .
    val guarded = ScaleBench.flagSuperlinear(Map("q" -> Seq(
      Point(600_000L, 0.005), Point(6_000_000L, 0.6))))
    assert(guarded.isEmpty, "0.6/max(0.005, 0.05) = 12 < 1.5 * 10")
    // . . . while an unambiguous blowup through the guard still flags
    val blowup = ScaleBench.flagSuperlinear(Map("q" -> Seq(
      Point(600_000L, 0.005), Point(6_000_000L, 2.0))))
    assert(blowup.map(_._1) == Seq("q"))
  }

  test("failed measurements are excluded from classification, not ratioed") {
    // a crash at the TOP point: its time-to-failure (fast OOM) must not
    // be classified — one surviving point cannot pair, so no flag
    val crashTop = Map("q_crash_top" -> Seq(
      Point(600_000L, 0.5), Point(6_000_000L, 0.1, ok = false)))
    assert(ScaleBench.flagSuperlinear(crashTop).isEmpty)
    // a crash at the MIDDLE point: the pair falls back to the remaining
    // ok points (60k, 6M), whose ratio classifies honestly
    val crashMid = Map("q_crash_mid" -> Seq(
      Point(60_000L, 0.30), Point(600_000L, 0.05, ok = false),
      Point(6_000_000L, 20.0)))
    assert(ScaleBench.flagSuperlinear(crashMid).isEmpty,
      "20/0.3 ≈ 67 < 1.5 × 100 over the surviving pair")
    // and a genuine blowup among the surviving points still flags
    val blowup = Map("q_blowup" -> Seq(
      Point(60_000L, 0.30, ok = false), Point(600_000L, 0.50),
      Point(6_000_000L, 20.0)))
    assert(ScaleBench.flagSuperlinear(blowup).map(_._1) == Seq("q_blowup"))
  }

  test("degenerate inputs (one point, equal rows, zero rows) are not flagged") {
    val pts = Map(
      "one_point" -> Seq(Point(1000L, 5.0)),
      "equal_rows" -> Seq(Point(1000L, 1.0), Point(1000L, 50.0)),
      "zero_rows" -> Seq(Point(0L, 0.1), Point(0L, 50.0)))
    assert(ScaleBench.flagSuperlinear(pts).isEmpty)
  }

  test("end-to-end: real catalog queries measure linear-class across two scale dirs") {
    val spark = TestSpark.spark
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    // a representative slice: scan+agg, dedup, text analysis
    val names = Seq("q01_industry_counts", "q34_exact_dedup", "q29_token_stats")
    val points = ScaleBench.runScale(spark, dirs, names)
    assert(points.keySet == names.toSet)
    points.values.foreach { pts =>
      assert(pts.size == 2 && pts.head.rows < pts.last.rows,
        "rows must grow with the scale dir")
    }
    // the flag itself: none of these linear-class queries may measure
    // superlinear (generous allowance absorbs local-mode timing noise)
    val flagged = ScaleBench.flagSuperlinear(points, allowance = 3.0)
    assert(flagged.isEmpty,
      s"linear-class queries measured superlinear: $flagged")
  }
}

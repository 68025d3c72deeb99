package graft

import graft.ops.RangeOps
import org.scalatest.funsuite.AnyFunSuite

/** Range join: exactness vs a brute-force BETWEEN count, inclusive bounds,
  * bucket-boundary spanning, and the no-cartesian plan guarantee. */
class RangeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketized counts equal the brute-force BETWEEN counts, bounds inclusive") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val intervals = Seq(
      ("2024-01-01", "2024-01-10"), // spans the 1970-anchored 7-day bucket edge
      ("2024-01-05", "2024-01-05"), // degenerate single-day interval
      ("2024-01-08", "2024-02-20"), // long interval, many buckets
      ("2024-02-01", "2024-02-03"))
      .map { case (a, b) => (d(a), d(b)) }.toDF("lo", "hi")
    val points = (0 until 60)
      .map(i => java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
      .toDF("day")
    // tiny bucket width forces multi-bucket replication of every interval
    val got = RangeOps.pointInIntervalCounts(points, "day", intervals, "lo", "hi", bucketDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val expect = points.collect().map(_.getDate(0)).map { p =>
      p.toString -> intervals.collect().count(r =>
        !p.before(r.getDate(0)) && !p.after(r.getDate(1))).toLong
    }.filter(_._2 > 0).toMap
    assert(got == expect)
    // inclusive endpoints spot-check
    assert(got("2024-01-01") == 1L && got("2024-01-10") == 2L)
  }

  test("range join plans an equi-join on the bucket, never a cartesian product") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val intervals = Seq((d("2024-01-01"), d("2024-01-10"))).toDF("lo", "hi")
    val points = Seq(d("2024-01-05")).toDF("day")
    val plan = RangeOps.pointInIntervalCounts(points, "day", intervals, "lo", "hi", 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n${plan.take(600)}")
  }
}

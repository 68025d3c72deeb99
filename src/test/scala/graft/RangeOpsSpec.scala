package graft

import graft.ops.RangeOps
import org.scalatest.funsuite.AnyFunSuite

/** Range join: both formulations (sweep-line counts, bucketized pairs)
  * vs a brute-force BETWEEN, inclusive bounds, bucket-boundary spanning,
  * and the no-cartesian plan guarantee. */
class RangeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def d = java.sql.Date.valueOf(_: String)

  private def fixture = {
    import spark.implicits._
    val intervals = Seq(
      ("2024-01-01", "2024-01-10"), // spans the 1970-anchored 7-day bucket edge
      ("2024-01-05", "2024-01-05"), // degenerate single-day interval
      ("2024-01-08", "2024-02-20"), // long interval, many buckets
      ("2024-02-01", "2024-02-03"))
      .map { case (a, b) => (d(a), d(b)) }.toDF("lo", "hi")
    val points = (0 until 60)
      .map(i => java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
      .toDF("day")
    (points, intervals)
  }

  private def bruteForceCounts(
      points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val ivRows = intervals.collect()
    points.collect().map(_.getDate(0)).map { p =>
      p.toString -> ivRows.count(r =>
        !p.before(r.getDate(0)) && !p.after(r.getDate(1))).toLong
    }.filter(_._2 > 0).toMap
  }

  test("sweep-line counts equal the brute-force BETWEEN counts, bounds inclusive") {
    val (points, intervals) = fixture
    val got = RangeOps.pointInIntervalCounts(points, "day", intervals, "lo", "hi")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(got == bruteForceCounts(points, intervals))
    // inclusive endpoints spot-check
    assert(got("2024-01-01") == 1L && got("2024-01-10") == 2L)
  }

  test("bucketized pairs match the brute force, each qualifying pair exactly once") {
    val (points, intervals) = fixture
    // tiny bucket width forces multi-bucket replication of every interval
    val pairs = RangeOps.rangeJoinPairs(points, "day", intervals, "lo", "hi", bucketDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getDate(2).toString))
    assert(pairs.length == pairs.distinct.length, "a pair met more than once")
    val counts = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(counts == bruteForceCounts(points, intervals))
  }

  test("neither formulation plans a cartesian product") {
    import spark.implicits._
    val intervals = Seq((d("2024-01-01"), d("2024-01-10"))).toDF("lo", "hi")
    val points = Seq(d("2024-01-05")).toDF("day")
    for (df <- Seq(
        RangeOps.rangeJoinPairs(points, "day", intervals, "lo", "hi", 30),
        RangeOps.pointInIntervalCounts(points, "day", intervals, "lo", "hi"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"range join must stay an equi-join:\n${plan.take(600)}")
    }
  }
}

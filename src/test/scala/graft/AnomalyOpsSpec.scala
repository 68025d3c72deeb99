package graft

import graft.ops.AnomalyOps
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Rolling z-score ingest anomalies: exact integer verdicts on a
  * hand-built series — spike fires, drop-to-zero fires via the calendar
  * gap-fill, constant days and short-baseline days never fire. */
class AnomalyOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(dayValues: Seq[(Int, Double)]) = {
    import spark.implicits._
    dayValues.map { case (d, v) =>
      (Timestamp.valueOf(f"2026-03-$d%02d 12:00:00"), v)
    }.toDF("ts", "value")
  }

  test("a spike over a constant baseline fires; constant and warm-up days do not") {
    val df = events((1 to 8).map(d => (d, 100.0)) :+ ((9, 1000.0)))
    val rows = AnomalyOps.anomalyDaily(df, "ts", "value", windowDays = 3, z2 = 1)
      .collect().map(r => (r.getDate(0).toString, r.getLong(2), r.getLong(4)))
    // first 3 days lack a full baseline
    rows.take(3).foreach { case (d, n, a) => assert(a == 0L && n < 3, s"$d") }
    // constant days with a full baseline: variance 0, deviation 0 -> quiet
    rows.slice(3, 8).foreach { case (d, n, a) => assert(a == 0L && n == 3L, s"$d") }
    // the 10x spike fires
    assert(rows.last == (("2026-03-09", 3L, 1L)))
  }

  test("a missing day is gap-filled to zero and flagged as a drop") {
    val df = events(Seq(1, 2, 3, 4, 6).map(d => (d, 100.0)))
    val byDay = AnomalyOps.anomalyDaily(df, "ts", "value", windowDays = 3, z2 = 1)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(byDay("2026-03-05") == ((0L, 1L)), "zero-filled drop day must fire")
    assert(byDay("2026-03-04") == ((100000000L, 0L)))
  }

  test("baseline sums are the exact trailing scaled-int totals") {
    val df = events(Seq((1, 1.5), (2, 2.25), (3, 4.0), (4, 8.0)))
    val byDay = AnomalyOps.anomalyDaily(df, "ts", "value", windowDays = 2, z2 = 1)
      .collect().map(r => r.getDate(0).toString -> r.getLong(3)).toMap
    assert(byDay("2026-03-03") == 3750000L)
    assert(byDay("2026-03-04") == 6250000L)
  }

  test("empty input produces an empty, schema-stable result") {
    val df = events(Seq.empty)
    val out = AnomalyOps.anomalyDaily(df, "ts", "value", windowDays = 3, z2 = 1)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("bucket", "total_e6", "win_n", "baseline_sum_e6", "is_anomaly"))
  }
}

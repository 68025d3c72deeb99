package graft

import graft.ops.ResampleOps
import org.scalatest.funsuite.AnyFunSuite

/** Decayed-counts arithmetic (the resample family's calendar ops are
  * oracle-covered by q07–q09/q40/q48). */
class ResampleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 12:00:00")

  test("decayed counts: exact half-life shift weights from the newest day") {
    import spark.implicits._
    // as-of = 2024-03-01 (newest). With half-life 7d:
    //   click  2024-03-01 (age 0,  bucket 0) -> 1000000
    //   click  2024-02-24 (age 6,  bucket 0) -> 1000000
    //   click  2024-02-23 (age 7,  bucket 1) ->  500000
    //   view   2024-01-01 (age 60, bucket 8) ->    3906  (1e6 >> 8)
    val df = Seq(
      (1L, ts("2024-03-01"), "click"),
      (2L, ts("2024-02-24"), "click"),
      (3L, ts("2024-02-23"), "click"),
      (4L, ts("2024-01-01"), "view"))
      .toDF("event_id", "ts", "event_type")
    val out = ResampleOps.decayedCounts(df, "ts", "event_type", halfLifeDays = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("click", 3L, 1000000L + 1000000L + 500000L),
      ("view", 1L, 1000000L >> 8)), s"got ${out.toSeq}")
  }

  test("decayed counts cap the shift at 30 and are repartition-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-03-01"), "a"),
      (2L, ts("1994-01-01"), "a")) // ~30 years old: bucket caps at 30
      .toDF("event_id", "ts", "event_type")
    val out = ResampleOps.decayedCounts(df, "ts", "event_type", halfLifeDays = 7)
      .collect()
    assert(out.head.getLong(4) == 1000000L + (1000000L >> 30)) // >>30 = 0
    val real = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val a = ResampleOps.decayedCounts(real, "ts", "event_type", 14).collect().toSeq
    val b = ResampleOps.decayedCounts(real.repartition(13), "ts", "event_type", 14)
      .collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}

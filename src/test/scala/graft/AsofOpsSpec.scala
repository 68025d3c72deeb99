package graft

import graft.ops.AsofOps
import org.scalatest.funsuite.AnyFunSuite

/** As-of join edge semantics: inclusive at-or-before, per-key isolation,
  * null when nothing precedes, max-tie winner among equal-ts build rows. */
class AsofOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asof join: inclusive bound, key isolation, no-match null, equal-ts max-tie") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val probe = Seq(
      (1L, ts(100), 10L), // exact-ts build at 100 matches (inclusive)
      (1L, ts(50), 11L),  // before every build for user 1 -> null
      (1L, ts(250), 12L), // latest build <= 250 is ts 200
      (2L, ts(300), 20L)) // user 2 sees only user-2 builds
      .toDF("user_id", "ts", "event_id")
    val build = Seq(
      (1L, ts(100), 1L, 5.0),
      (1L, ts(100), 2L, 6.0), // same key+ts: max event_id (2) must win
      (1L, ts(200), 3L, 7.0),
      (2L, ts(90), 4L, 8.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsofOps
      .asofJoin(probe, build, "user_id", "ts", "event_id", Seq("value"))
      .collect()
      .map(r => (r.getLong(2),
        Option(r.getStruct(3)).map(m => (m.getLong(1), m.getDouble(2)))))
      .toMap
    assert(out(10L).contains((2L, 6.0))) // inclusive + max-tie
    assert(out(11L).isEmpty)             // nothing at-or-before
    assert(out(12L).contains((3L, 7.0))) // latest preceding
    assert(out(20L).contains((4L, 8.0))) // key isolation
  }

  test("forward asof: inclusive at-or-after, earliest wins, tolerance nulls far matches") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val probe = Seq(
      (1L, ts(100), 10L), // exact-ts build at 100 matches (inclusive)
      (1L, ts(150), 11L), // earliest build >= 150 is ts 200
      (1L, ts(250), 12L), // nothing at-or-after -> null
      (2L, ts(10), 20L))  // match at 5000: outside 600 s tolerance -> null
      .toDF("user_id", "ts", "event_id")
    val build = Seq(
      (1L, ts(100), 1L, 5.0),
      (1L, ts(100), 2L, 6.0), // same key+ts: max event_id (2) must win
      (1L, ts(200), 3L, 7.0),
      (2L, ts(5000), 4L, 8.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsofOps
      .asofJoinDirected(probe, build, "user_id", "ts", "event_id", Seq("value"),
        forward = true, toleranceUs = Some(600L * 1000000L))
      .collect()
      .map(r => (r.getLong(2),
        Option(r.getStruct(3)).map(m => (m.getLong(1), m.getDouble(2)))))
      .toMap
    assert(out(10L).contains((2L, 6.0))) // inclusive + max-tie
    assert(out(11L).contains((3L, 7.0))) // earliest at-or-after
    assert(out(12L).isEmpty)             // nothing follows
    assert(out(20L).isEmpty)             // out of tolerance
  }

  test("backward tolerance: in-window match kept, far match nulled") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val probe = Seq((1L, ts(1000), 10L), (2L, ts(1000), 20L))
      .toDF("user_id", "ts", "event_id")
    val build = Seq((1L, ts(950), 1L, 5.0), (2L, ts(100), 2L, 6.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsofOps
      .asofJoinDirected(probe, build, "user_id", "ts", "event_id", Seq("value"),
        forward = false, toleranceUs = Some(100L * 1000000L))
      .collect()
      .map(r => (r.getLong(2), Option(r.getStruct(3)).map(_.getLong(1)))).toMap
    assert(out(10L).contains(1L)) // 50 s back, inside 100 s
    assert(out(20L).isEmpty)      // 900 s back, outside
  }

  test("asof join plans one shuffle on the key, no join node") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val probe = Seq((1L, ts(1), 1L)).toDF("user_id", "ts", "event_id")
    val build = Seq((1L, ts(1), 2L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val plan = AsofOps.asofJoin(probe, build, "user_id", "ts", "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n${plan.take(600)}")
    assert("Exchange hashpartitioning\\(__k".r.findAllIn(plan).length <= 2,
      "asof should shuffle each side once on the key")
  }
}

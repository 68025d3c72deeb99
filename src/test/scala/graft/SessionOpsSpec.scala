package graft

import graft.ops.SessionOps
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral-analytics operators: strict-sequence funnel and cohort
  * retention (sessionization itself is covered by the batch/stream
  * agreement tests in StreamingOpsSpec + the q37 oracle). */
class SessionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("conversion funnel enforces stage order, not mere presence") {
    import spark.implicits._
    val events = Seq(
      // u1: full ordered sequence
      (1L, ts(10), 1L, "view"), (1L, ts(20), 2L, "click"), (1L, ts(30), 3L, "purchase"),
      // u2: click BEFORE the first view never qualifies, so the later
      // purchase cannot qualify either
      (2L, ts(10), 4L, "click"), (2L, ts(20), 5L, "view"), (2L, ts(30), 6L, "purchase"),
      // u3: view only
      (3L, ts(10), 7L, "view"),
      // u4: no funnel events at all
      (4L, ts(10), 8L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = SessionOps.conversionFunnel(
      events, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, "view", 3L), (1L, "click", 1L), (2L, "purchase", 1L)))
  }

  test("funnel counts an equal-timestamp next stage (inclusive), ordered by event id") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), 1L, "view"), (1L, ts(10), 2L, "click"), // same ts, view first by id
      (2L, ts(10), 4L, "click"), (2L, ts(10), 5L, "view")) // click precedes its view by id
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = SessionOps.conversionFunnel(
      events, "user_id", "ts", "event_id", "event_type", Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(rows == Map("view" -> 2L, "click" -> 1L))
  }

  test("cohort retention triangle matches a hand-built two-cohort history") {
    import spark.implicits._
    def day(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // 2024-01-01 and 2024-01-08 are Mondays
    val events = Seq(
      (1L, day("2024-01-02")), // u1 cohort W0
      (1L, day("2024-01-10")), // u1 active W1
      (1L, day("2024-01-11")), // same week, deduplicated
      (2L, day("2024-01-09"))) // u2 cohort W1
      .toDF("user_id", "ts")
    val rows = SessionOps.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("funnel and cohort shuffle once on the user key") {
    import spark.implicits._
    val events = Seq((1L, ts(10), 1L, "view")).toDF("user_id", "ts", "event_id", "event_type")
    val plan = SessionOps.conversionFunnel(
      events, "user_id", "ts", "event_id", "event_type", Seq("view", "click"))
      .queryExecution.executedPlan.toString
    // chained stage windows + per-user agg must reuse one user-key exchange
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length <= 1,
      s"funnel should partition by user once:\n${plan.take(800)}")
  }

  test("eventTransitions: Markov counts and per-from shares off a hand sequence") {
    import spark.implicits._
    val events = Seq(
      // u1: a -> b -> a -> c ; u2: a -> b (cross-user pairs never count)
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "a"), (1L, ts(4), 4L, "c"),
      (2L, ts(9), 5L, "a"), (2L, ts(10), 6L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = SessionOps.eventTransitions(events, "user_id", "ts", "event_id",
      "event_type", k = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    // from a: b twice, c once -> shares 666666 / 333333
    assert(r(("a", "b")) == ((2L, 666666L)))
    assert(r(("a", "c")) == ((1L, 333333L)))
    // from b: a once (u1 only; u2's b is terminal)
    assert(r(("b", "a")) == ((1L, 1000000L)))
    assert(r.size == 3)
  }

  test("funnel dwell: first-A-to-first-qualifying-B seconds with the equal-ts id tiebreak") {
    import spark.implicits._
    val events = Seq(
      // u1: view t=0, purchase t=10 -> dwell 10
      (1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "purchase"),
      // u2: purchase BEFORE first view does not qualify; later one does -> 14
      (2L, ts(5), 3L, "purchase"), (2L, ts(6), 4L, "view"), (2L, ts(20), 5L, "purchase"),
      // u3: view only; u4: purchase only -> both excluded
      (3L, ts(1), 6L, "view"), (4L, ts(1), 7L, "purchase"),
      // u5: equal ts, purchase id AFTER view id -> qualifies, dwell 0
      (5L, ts(100), 50L, "view"), (5L, ts(100), 51L, "purchase"),
      // u6: equal ts, purchase id BEFORE view id -> does NOT qualify
      (6L, ts(100), 61L, "purchase"), (6L, ts(100), 62L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = SessionOps.funnelDwell(events, "user_id", "ts", "event_id",
      "event_type", "view", "purchase", percents = Seq(25, 50, 90)).collect()
    assert(r.length == 1)
    // dwells {0, 10, 14}: rank ceil(p*3/100) -> p25=0, p50=10, p90=14
    assert(r.head.getAs[Long]("n_users") == 3L)
    assert(r.head.getAs[Long]("p25") == 0L)
    assert(r.head.getAs[Long]("p50") == 10L)
    assert(r.head.getAs[Long]("p90") == 14L)
  }
}

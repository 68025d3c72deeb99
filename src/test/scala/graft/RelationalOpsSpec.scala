package graft

import graft.io.Tables
import graft.ops.RelationalOps
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the relational family on sf0.001 (values are
  * hash-checked against DuckDB by tools/oracle_check.py; here we pin
  * invariants that survive data regeneration). */
class RelationalOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("rollup grand total equals table count") {
    val rows = RelationalOps.orderRollup(Tables.orders(spark, sf)).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == Tables.orders(spark, sf).count())
    // subtotal consistency: per-status subtotals sum to the grand total
    val statusSubtotals = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(statusSubtotals.map(_.getLong(2)).sum == grand.head.getLong(2))
  }

  test("cube adds the priority-only marginals on top of rollup, in one Expand") {
    val rollup = RelationalOps.orderRollup(Tables.orders(spark, sf)).collect()
    val cube = RelationalOps.orderCube(Tables.orders(spark, sf)).collect()
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val rollupMap = rollup.map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    val cubeMap = cube.map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    // every rollup row appears identically in the cube
    rollupMap.foreach { case (k, v) => assert(cubeMap(k) == v, s"cube differs at $k") }
    // the extra rows are exactly the (ALL, priority) marginals, and each
    // marginal equals the sum of its per-status cells
    val extras = cubeMap.keySet -- rollupMap.keySet
    assert(extras.nonEmpty && extras.forall(_._1 == "ALL"))
    extras.foreach { case k @ ("ALL", p) =>
      val cells = cube.filter(r => r.getString(0) != "ALL" && r.getString(1) == p)
      assert(cubeMap(k)._1 == cells.map(_.getLong(2)).sum)
      assert(cubeMap(k)._2 == cells.map(_.getLong(3)).sum)
    }
    // one Expand + one aggregate, not one job per grouping set
    val plan = RelationalOps.orderCube(Tables.orders(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube should execute via Expand:\n${plan.take(400)}")
  }

  test("grouping-sets marginals: one-dim totals and grand total only, never the cross") {
    val rows = RelationalOps.orderMarginals(Tables.orders(spark, sf)).collect()
    // every row has at least one ALL — the (status, priority) cross is
    // exactly what this set list excludes
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == "ALL" || r.getString(1) == "ALL",
        s"unexpected cross cell: $r")
    }
    val cube = RelationalOps.orderCube(Tables.orders(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // each marginal row equals the identical cube cell
    rows.foreach { r =>
      assert(cube((r.getString(0), r.getString(1))) == ((r.getLong(2), r.getLong(3))),
        s"marginal differs from cube at $r")
    }
    // and it executes as one Expand, not one job per set
    val plan = RelationalOps.orderMarginals(Tables.orders(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"grouping sets should execute via Expand:\n${plan.take(400)}")
  }

  test("pivot daily event counts: wide schema, zero-filled cells, one pass") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 10:00:00")
    val ev = Seq(
      (1L, ts("2024-01-01"), "view"), (2L, ts("2024-01-01"), "view"),
      (3L, ts("2024-01-01"), "click"), (4L, ts("2024-01-02"), "purchase"))
      .toDF("event_id", "ts", "event_type")
    val out = RelationalOps.pivotDailyEventCounts(ev, "ts", "event_type",
      Seq("click", "purchase", "view"))
    assert(out.columns.toSeq == Seq("day", "click", "purchase", "view"))
    val rows = out.collect().map(r =>
      (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 1L, 0L, 2L),
      ("2024-01-02", 0L, 1L, 0L)), s"got ${rows.toSeq}")
  }

  test("mad outliers: nearest-rank median/MAD, integer flag rule, hand-checked") {
    import spark.implicits._
    // metric values 10,10,11,12,13,100: median (nearest-rank p50 over the
    // distinct-value histogram, ceil(6*50/100)=3rd row) = 11;
    // deviations 1,1,0,1,2,89 -> sorted 0,1,1,1,2,89, median dev (3rd) = 1
    // flag rule dev*1 > 1*3: only the 89 row
    val df = Seq((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L), (5L, 13L), (6L, 100L))
      .toDF("id", "m")
    val out = RelationalOps.madOutliers(df, "id", "m", num = 3, den = 1, limit = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((6L, 100L, 11L, 89L, 1L)), s"got ${out.toSeq}")
  }

  test("revenue by nation covers every nation with lineitems and is positive") {
    val df = RelationalOps.revenueByNation(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) > 0L))
  }

  test("top customers per segment: <=5 per segment, spend non-increasing") {
    val rows = RelationalOps
      .topCustomersPerSegment(Tables.orders(spark, sf), Tables.customer(spark, sf), 5)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val spend = rs.sortBy(_.getLong(5)).map(_.getLong(3))
      spend.zip(spend.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("dim joins are planned as broadcasts") {
    val plan = RelationalOps.revenueByNation(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for nation/region dims")
  }

  test("anti-join: inactive + active customers partition the customer table") {
    val cutoff = "2001-01-01 00:00:00"
    val customers = Tables.customer(spark, sf).count()
    val inactive = RelationalOps.inactiveCustomersByNation(
      Tables.customer(spark, sf), Tables.orders(spark, sf), Tables.nation(spark, sf), cutoff)
      .collect().map(_.getLong(1)).sum
    import org.apache.spark.sql.functions._
    val active = Tables.customer(spark, sf).join(
      Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
        .select("o_custkey").distinct(),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(inactive + active == customers)
  }

  test("percentile clip: nearest-rank bounds match the sorted-rank definition") {
    import spark.implicits._
    // 100 rows with metric 1..100 -> p10 bound = value at rank 10 = 10,
    // p90 bound = value at rank 90 = 90; survivors are exactly 10..90
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "m")
    val kept = RelationalOps.percentileClip(df, "m", 10, 90)
      .select("m").collect().map(_.getLong(0)).sorted
    assert(kept.head == 10L && kept.last == 90L && kept.length == 81)
    // duplicates: ranks count occurrences, not distinct values
    val dup = Seq.fill(97)(5L).zipWithIndex.map { case (m, i) => (i.toLong, m) } ++
      Seq((97L, 1L), (98L, 2L), (99L, 100L))
    val keptDup = RelationalOps.percentileClip(dup.toDF("id", "m"), "m", 10, 90)
      .select("m").collect().map(_.getLong(0))
    // p10 rank 10 and p90 rank 90 both land inside the run of 5s
    assert(keptDup.forall(_ == 5L) && keptDup.length == 97)
    // full range keeps everything
    assert(RelationalOps.percentileClip(df, "m", 0, 100).count() == 100)
  }

  test("equi-depth histogram: quartiles of a uniform range are exact, contiguous, conserving") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "m")
    val rows = RelationalOps.equiDepthHistogram(df, "m", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // uniform 1..1000: each quartile holds exactly 250 rows
    assert(rows.forall(_._2 == 250L), rows.mkString(", "))
    // buckets tile the range contiguously
    rows.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3) }
    assert(rows.map(_._2).sum == 1000L)
  }

  test("equi-depth histogram: a heavy duplicate run lands in one bucket, rows still conserved") {
    import spark.implicits._
    // 900 copies of 7 plus 1..100: equi-WIDTH would spread them; the
    // nearest-rank rule keeps every 7 in the same bucket
    val df = (Seq.fill(900)(7L) ++ (1L to 100L)).zipWithIndex
      .map { case (m, i) => (i.toLong, m) }.toDF("id", "m")
    val rows = RelationalOps.equiDepthHistogram(df, "m", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == 1000L)
    val bucketOf7 = RelationalOps.equiDepthHistogram(df, "m", 4)
      .collect().filter(r => r.getLong(2) <= 7L && 7L <= r.getLong(3))
    assert(bucketOf7.length == 1)
  }

  test("grouped percentiles: hand-computed nearest-rank cuts per group") {
    import spark.implicits._
    // group a: 1..10 -> p50 = rank 5 = 5, p90 = rank 9 = 9, p100 = 10
    // group b: ten copies of 7 -> every cut = 7
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 10).map(_ => ("b", 7L))).toDF("src", "m")
    val r = RelationalOps.groupedPercentiles(df, "src", "m", Seq(50, 90, 100))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map(("a", 50L) -> 5L, ("a", 90L) -> 9L, ("a", 100L) -> 10L,
      ("b", 50L) -> 7L, ("b", 90L) -> 7L, ("b", 100L) -> 7L))
    // single-group calibration agrees with the global nearestRankBounds
    // machinery (same rank convention, so they cannot drift)
    val one = df.filter($"src" === "a")
    val g = RelationalOps.groupedPercentiles(one, "src", "m", Seq(10, 90))
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    val b = RelationalOps.nearestRankBounds(one, "m", Seq(10, 90)).collect()(0)
    assert(g(10L) == b.getLong(0) && g(90L) == b.getLong(1))
    intercept[IllegalArgumentException] {
      RelationalOps.groupedPercentiles(df, "src", "m", Seq(90, 50))
    }
  }

  test("rankBlend: hand-computed ECDF ranks, truncating blend, null rows drop") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), Some(5L)), (2L, Some(20L), Some(5L)),
      (3L, Some(20L), Some(5L)), (4L, Some(30L), Some(5L)),
      (5L, Some(99L), None)) // null m2 -> dropped everywhere
      .toDF("id", "m1", "m2")
    val rows = RelationalOps.rankBlend(df, "id", Seq("m1", "m2"), limit = 10)
      .collect()
    // n = 4 after the null drop; m1 ECDF: 10 -> 1/4, 20 -> 3/4, 30 -> 4/4;
    // m2 all ties -> 10^6; blend = (r1 + r2) div 2
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(byId(1L) == (250000L, 1000000L, 625000L))
    assert(byId(2L) == (750000L, 1000000L, 875000L))
    assert(byId(3L) == (750000L, 1000000L, 875000L))
    assert(byId(4L) == (1000000L, 1000000L, 1000000L))
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L, 2L, 3L, 1L),
      "order must be blend desc, id asc")
    // limit cuts after the deterministic sort
    val top = RelationalOps.rankBlend(df, "id", Seq("m1", "m2"), limit = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(4L, 2L))
    intercept[IllegalArgumentException] {
      RelationalOps.rankBlend(df, "id", Seq.empty, 5)
    }
  }

  test("rankBlend is partitioning-independent and plans no unpartitioned window") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i % 17, i % 5)).toDF("id", "m1", "m2")
    val a = RelationalOps.rankBlend(df.repartition(1), "id", Seq("m1", "m2"), 50).collect().toSeq
    val b = RelationalOps.rankBlend(df.repartition(13), "id", Seq("m1", "m2"), 50).collect().toSeq
    assert(a == b)
    val plan = RelationalOps.rankBlend(df, "id", Seq("m1", "m2"), 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("No Partition Defined"),
      s"unpartitioned window in:\n$plan")
  }

  test("integerCorrelation: +-1 on exact linear data, null on zero variance, exact moments") {
    import spark.implicits._
    val up = Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("x", "y")
    val r1 = RelationalOps.integerCorrelation(up, "x", "y").collect().head
    assert(r1.getLong(0) == 4L && r1.getDouble(1) == 1.0)
    val down = Seq((1, 40), (2, 30), (3, 20), (4, 10)).toDF("x", "y")
    assert(RelationalOps.integerCorrelation(down, "x", "y")
      .collect().head.getDouble(1) == -1.0)
    // zero variance on y -> null, not a division error (ANSI mode)
    val flat = Seq((1, 7), (2, 7), (3, 7)).toDF("x", "y")
    assert(RelationalOps.integerCorrelation(flat, "x", "y").collect().head.isNullAt(1))
    // single pair -> null
    val one = Seq((1, 2)).toDF("x", "y")
    assert(RelationalOps.integerCorrelation(one, "x", "y").collect().head.isNullAt(1))
    // partitioning-invariant (decimal-exact moments)
    val big = (1L to 500L).map(i => (i, (i * 37) % 101)).toDF("x", "y")
    val a = RelationalOps.integerCorrelation(big.repartition(1), "x", "y").collect().head
    val b = RelationalOps.integerCorrelation(big.repartition(13), "x", "y").collect().head
    assert(a.toString == b.toString)
  }

  test("calibratedClip: per-group cuts and kept shares off hand-computed percentiles") {
    import spark.implicits._
    // A: 1..10 -> p10 cut = rank ceil(1) = 1, p90 cut = rank 9 = 9; keep 1..9
    // B: ten copies of 5 -> both cuts 5, keep all
    val df = ((1 to 10).map(v => ("A", v)) ++ (1 to 10).map(_ => ("B", 5)))
      .toDF("g", "v")
    val r = RelationalOps.calibratedClip(df, "g", "v", pLo = 10, pHi = 90)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    assert(r("A") == ((1L, 9L, 10L, 9L, 900000L)))
    assert(r("B") == ((5L, 5L, 10L, 10L, 1000000L)))
    // cuts agree with the shared groupedPercentiles rank convention
    val gp = RelationalOps.groupedPercentiles(df, "g", "v", Seq(10, 90))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(gp(("A", 10L)) == r("A")._1 && gp(("A", 90L)) == r("A")._2)
  }

  test("ksPairwise: hand-computed gap, zero for identical, 10^6 for disjoint") {
    import spark.implicits._
    // A=[1,1,2,3] ecdf 500000/750000/1e6; B=[1,2,2,4] ecdf 250000/750000/750000/1e6
    // gaps at v=1..4: 250000, 0, 250000, 0 -> ks 250000
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("A", 3),
      ("B", 1), ("B", 2), ("B", 2), ("B", 4)).toDF("g", "v")
    val r = RelationalOps.ksPairwise(df, "g", "v").collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "A" && r.head.getString(1) == "B")
    assert(r.head.getAs[Long]("n_a") == 4 && r.head.getAs[Long]("n_b") == 4)
    assert(r.head.getAs[Long]("ks_ppm") == 250000L)
    // identical distributions -> 0
    val same = Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2)).toDF("g", "v")
    assert(RelationalOps.ksPairwise(same, "g", "v")
      .collect().head.getAs[Long]("ks_ppm") == 0L)
    // disjoint supports -> full gap 10^6
    val dis = Seq(("A", 1), ("A", 2), ("B", 10), ("B", 11)).toDF("g", "v")
    assert(RelationalOps.ksPairwise(dis, "g", "v")
      .collect().head.getAs[Long]("ks_ppm") == 1000000L)
  }

  test("ksPairwise: every unordered pair once; null metrics drop; partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (s"s${i % 4}", if (i % 7 == 0) null
      else java.lang.Long.valueOf(i % 23))).toDF("g", "v")
    val r = RelationalOps.ksPairwise(df, "g", "v").collect()
    assert(r.length == 6) // C(4,2)
    assert(r.forall(x => x.getString(0) < x.getString(1)))
    assert(r.forall(x => x.getAs[Long]("ks_ppm") >= 0 &&
      x.getAs[Long]("ks_ppm") <= 1000000L))
    val b = RelationalOps.ksPairwise(df.repartition(13), "g", "v").collect()
    assert(r.toSeq == b.toSeq)
  }
}

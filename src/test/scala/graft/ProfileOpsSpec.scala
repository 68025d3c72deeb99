package graft

import graft.ops.ProfileOps
import org.scalatest.funsuite.AnyFunSuite

/** One-scan table profiling: per-column nulls, exact distincts, metric
  * ranges; type dispatch (value vs length) and single-scan plan shape. */
class ProfileOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "alpha", Some(10L)),
      (2L, "beta", None),
      (3L, null.asInstanceOf[String], Some(10L)),
      (4L, "gamma-long", Some(7L)),
      (5L, "beta", None)
    ).toDF("id", "name", "score")
  }

  test("profile counts nulls, exact distincts, and metric ranges per column") {
    val rows = ProfileOps.tableProfile(fixture, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("id") == ((0L, 5L, 1L, 5L)))
    // name: one null, three distinct non-null, length range 4..10
    assert(rows("name") == ((1L, 3L, 4L, 10L)))
    // score: two nulls, two distinct, value range 7..10
    assert(rows("score") == ((2L, 2L, 7L, 10L)))
  }

  test("profile output is ordered by column name and uniformly BIGINT") {
    val out = ProfileOps.tableProfile(fixture, Seq("score", "id", "name"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("id", "name", "score"))
    assert(out.schema.fields.drop(1).forall(_.dataType.typeName == "long"))
  }

  test("profile reads the source exactly once") {
    val df = ProfileOps.tableProfile(
      graft.io.Tables.documents(spark, "/root/testdata/sf0.001"),
      Seq("doc_id", "lang", "n_chars"))
    val scans = "FileScan|Scan parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(scans == 1, s"expected one scan, got $scans")
  }

  test("approx profile matches exact nulls/ranges, distincts within rsd, and plans no Expand") {
    val exact = ProfileOps.tableProfile(
      graft.io.Tables.documents(spark, "/root/testdata/sf0.001"),
      Seq("doc_id", "lang", "n_chars"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val approxDf = ProfileOps.tableProfileApprox(
      graft.io.Tables.documents(spark, "/root/testdata/sf0.001"),
      Seq("doc_id", "lang", "n_chars"), rsd = 0.05)
    val approx = approxDf.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    exact.foreach { case (c, (nn, nd, mn, mx)) =>
      val (ann, and, amn, amx) = approx(c)
      assert(ann == nn && amn == mn && amx == mx, s"$c non-sketch fields")
      // HLL++ at rsd=0.05: allow 4 sigma
      assert(math.abs(and - nd) <= math.max(2L, (nd * 0.2).toLong), s"$c distinct $and vs $nd")
    }
    // the exact form pays an Expand for multi-distinct; the sketch form must not
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("profile rejects non-integral non-string columns loudly") {
    import spark.implicits._
    val df = Seq((1L, 1.5)).toDF("id", "d")
    intercept[IllegalArgumentException](ProfileOps.tableProfile(df, Seq("d")))
  }

  test("column registers: shard-merge equals the one-shot build bit-identically") {
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val cols = Seq("doc_id", "lang", "n_chars", "source")
    val whole = ProfileOps.columnRegisters(docs, cols)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val merged = ProfileOps.mergeColumnRegisters((0 until 3).map(i =>
      ProfileOps.columnRegisters(docs.filter(col("doc_id") % 3 === i), cols)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(whole.nonEmpty && merged == whole,
      "cell-wise max merge must reproduce the one-shot register file")
    // and replaying a shard changes nothing (idempotent merge)
    val s0 = ProfileOps.columnRegisters(docs.filter(col("doc_id") % 3 === 0), cols)
    val withDup = ProfileOps.mergeColumnRegisters(Seq(s0, s0) ++ (1 until 3).map(i =>
      ProfileOps.columnRegisters(docs.filter(col("doc_id") % 3 === i), cols)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(withDup == whole, "replayed shards must not change the artifact")
  }

  test("column distinct estimates land within HLL error of the exact counts") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val cols = Seq("doc_id", "lang", "source")
    val est = ProfileOps.columnDistinctEstimates(
      ProfileOps.columnRegisters(docs, cols))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = cols.map(c => c -> docs.select(c).distinct().count().toDouble).toMap
    cols.foreach { c =>
      val rel = math.abs(est(c) - exact(c)) / math.max(exact(c), 1.0)
      // m = 256 buckets -> ~1.04/sqrt(256) = 6.5% standard error; 4 sigma
      assert(rel < 0.26, s"$c: est ${est(c)} vs exact ${exact(c)} (rel $rel)")
    }
  }

  test("joinIntegrity: orphan shares off a hand-computed key overlap") {
    import spark.implicits._
    val left = Seq(1L, 1L, 2L, 3L).toDF("doc_id")
    val right = Seq(2L, 3L, 3L, 4L, 5L).toDF("vec_id")
    val r = graft.ops.ProfileOps.joinIntegrity(left, "doc_id", right, "vec_id")
      .collect().head
    assert(r.getAs[Long]("n_left") == 4L && r.getAs[Long]("n_right") == 5L)
    assert(r.getAs[Long]("n_left_keys") == 3L && r.getAs[Long]("n_right_keys") == 4L)
    assert(r.getAs[Long]("n_matched_keys") == 2L)
    assert(r.getAs[Long]("left_orphan_ppm") == 333333L)
    assert(r.getAs[Long]("right_orphan_ppm") == 500000L)
  }
}

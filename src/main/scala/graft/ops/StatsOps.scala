package graft.ops

import graft.model.AnalysisConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation / top-K operator family (reference `generate_stats_report`
  * `main.py:385-437`, most-active channels `main.py:863-877`, channel audit
  * `main.py:894-923`).
  *
  * Scale notes:
  *  - global top-K compiles to `TakeOrderedAndProject` (per-partition heap +
  *    driver merge of K rows — no full sort, no full shuffle);
  *  - per-group top-K uses `row_number()` over a window; with AQE, skewed
  *    industry partitions are split at runtime;
  *  - all orderings carry explicit tiebreakers so results are deterministic
  *    under any partitioning (required for oracle hash-compare, and good
  *    hygiene generally).
  */
object StatsOps {

  /** A1 per-industry post counts (input: cleanExploded). */
  def industryCounts(exploded: DataFrame): DataFrame =
    exploded.groupBy("industry").agg(count(lit(1)).as("n_posts")).orderBy("industry")

  /** T1 per-group top-K posts by a metric (reference top-20 posts per
    * industry, `main.py:427`; top-3 audit posts, `main.py:910`). */
  def topPostsPerIndustry(exploded: DataFrame, cfg: AnalysisConfig, k: Int): DataFrame = {
    val m = cfg.posts
    val w = Window
      .partitionBy(col("industry"))
      .orderBy(col(m.viewsCol).desc, col(m.idCol).asc)
    exploded
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(
        col("industry"),
        col(m.idCol).as("post_id"),
        col(m.channelCol).as("channel"),
        col(m.viewsCol).cast("long").as("views"),
        col("rk"))
      .orderBy(col("industry"), col("rk"))
  }

  /** T1 per-group top-K via the BOUNDED [[graft.functions.TopKAgg]]
    * aggregate — identical semantics to [[topPostsPerIndustry]]'s window
    * form (same metric-DESC, id-ASC tiebreak; equality spec-pinned) with
    * the 100 TB plan: the window shuffles every row to its group's
    * reducer, the aggregate partial-combines map-side so the exchange
    * carries at most k (metric, id) pairs per group per map partition.
    * Output: (groupCol, rk, idCol, metricCol), rank 1-based. */
  def topKPerGroupBounded(
      df: DataFrame, groupCol: String, metricCol: String, idCol: String,
      k: Int): DataFrame =
    df.filter(col(metricCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAgg.topK(k)(
        col(metricCol).cast("long"), col(idCol).cast("long")).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rk"),
        col("__e._2").as(idCol), col("__e._1").as(metricCol))
      .orderBy(col(groupCol), col("rk"))

  /** A2+T2 top channels by summed views within each industry
    * (reference `main.py:428`). Partial (map-side) aggregation happens
    * automatically in the hash aggregate; the window then runs over the
    * already-reduced (industry, channel) domain, not raw posts. */
  def topChannelsByViews(exploded: DataFrame, cfg: AnalysisConfig, k: Int): DataFrame = {
    val m = cfg.posts
    val agg = exploded
      .groupBy(col("industry"), col(m.channelCol).as("channel"))
      .agg(sum(col(m.viewsCol)).cast("long").as("total_views"))
    val w = Window.partitionBy(col("industry")).orderBy(col("total_views").desc, col("channel").asc)
    agg
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy(col("industry"), col("rk"))
  }

  /** A3+T2 most-active channels by post count over the clean set
    * (reference `main.py:863-877`). Global top-K: TakeOrderedAndProject. */
  def mostActiveChannels(clean: DataFrame, cfg: AnalysisConfig, k: Int): DataFrame =
    clean
      .groupBy(col(cfg.posts.channelCol).as("channel"))
      .agg(count(lit(1)).as("n_posts"))
      .orderBy(col("n_posts").desc, col("channel").asc)
      .limit(k)

  /** Channel audit (reference `export_channel_audit`, `main.py:894-923`):
    * for each industry's top-N channels by views, the top-M posts by views
    * with a 100-char snippet (newlines -> spaces, "..." suffix,
    * `main.py:918` — P10 SUBSTR-PROJECT). Two windows, one shared input.
    *
    * Deliberately TWO consumers of `exploded` (standalone, the corpus is
    * scanned+tagged twice): the ranking branch's groupBy reduces map-side
    * to the (industry, channel) domain, so its shuffle is tiny. The
    * "single-pass" alternative — window-sum channel views over the raw
    * rows, then distinct — was measured and rejected: the unframed window
    * shuffles the ENTIRE corpus a second time (no partial aggregation),
    * and column-pruning divergence between the branches defeats
    * ReuseExchange anyway. In the composed pipeline the double scan
    * disappears behind `Pipeline.run`'s cached clean+tag stage. */
  def channelAudit(exploded: DataFrame, cfg: AnalysisConfig, topChannels: Int, postsPerChannel: Int): DataFrame = {
    val m = cfg.posts
    val top = topChannelsByViews(exploded, cfg, topChannels).select("industry", "channel", "rk")
      .withColumnRenamed("rk", "channel_rank")
    val wPosts = Window
      .partitionBy(col("industry"), col("channel"))
      .orderBy(col(m.viewsCol).desc, col(m.idCol).asc)
    exploded
      .withColumnRenamed(m.channelCol, "channel")
      .join(broadcast(top), Seq("industry", "channel"))
      .withColumn("post_rank", row_number().over(wPosts))
      .filter(col("post_rank") <= postsPerChannel)
      .select(
        col("industry"),
        col("channel"),
        col("channel_rank"),
        col("post_rank"),
        col(m.idCol).as("post_id"),
        col(m.viewsCol).cast("long").as("views"),
        concat(translate(substring(col(m.textCol), 1, 100), "\n", " "), lit("...")).as("snippet"))
      .orderBy(col("industry"), col("channel_rank"), col("post_rank"))
  }
}

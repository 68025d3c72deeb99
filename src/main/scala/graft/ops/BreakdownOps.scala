package graft.ops

import graft.model.AnalysisConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A4 keyword breakdown — per-(industry, keyword) post counts with
  * OVERLAPPING semantics (a post containing two keywords counts for both;
  * reference `main.py:369-378`).
  *
  * The reference does one full scan per keyword (O(keywords) passes). Here it
  * is ONE pass: broadcast the tiny (industry, keyword) dimension, join on
  * substring-contains, aggregate. The probe side streams through codegen'd
  * `Contains` predicates; no shuffle of the fact table at all (broadcast
  * join), then a tiny aggregate over (industry, keyword).
  */
object BreakdownOps {

  /** The keyword taxonomy as a dimension table (industry, keyword). */
  def keywordDim(spark: SparkSession, cfg: AnalysisConfig): DataFrame = {
    import spark.implicits._
    cfg.taxonomy.keywordDim.toDF("industry", "keyword")
  }

  /** LEFT join from the dimension so zero-hit keywords still appear with
    * n_posts = 0 (the reference reports every configured keyword). */
  def keywordBreakdown(spark: SparkSession, clean: DataFrame, cfg: AnalysisConfig): DataFrame = {
    val dim = broadcast(keywordDim(spark, cfg))
    val textCol = cfg.posts.textCol
    dim
      .join(clean, col(textCol).contains(col("keyword")), "left")
      .groupBy("industry", "keyword")
      .agg(count(col(textCol)).as("n_posts"))
      .orderBy("industry", "keyword")
  }

  /** P9 CONJUNCTION debug query (reference `debug_specific_keyword`,
    * `main.py:956-990`): posts of one industry containing one keyword.
    *
    * Divergence, by design: the reference's pandas `str.contains(kw)` runs
    * with `regex=True` (`main.py:970`), so a keyword with regex
    * metacharacters (`c++`, `a.b`) is interpreted as a PATTERN there — a
    * footgun, not a feature (every other keyword path in the reference
    * escapes its literals, `main.py:223-237`). This engine uses literal
    * substring containment for all keywords uniformly; pass a `rlike` filter
    * explicitly if pattern semantics are wanted. */
  def debugKeyword(exploded: DataFrame, cfg: AnalysisConfig, industry: String, keyword: String, k: Int): DataFrame = {
    val m = cfg.posts
    exploded
      .filter(col("industry") === industry && col(m.textCol).contains(keyword))
      .select(
        col(m.idCol).as("post_id"),
        col(m.channelCol).as("channel"),
        col(m.viewsCol).cast("long").as("views"))
      .orderBy(col("views").desc, col("post_id").asc)
      .limit(k)
  }
}

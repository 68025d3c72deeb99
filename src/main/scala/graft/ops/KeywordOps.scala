package graft.ops

import graft.functions.KeywordMatch
import graft.model.{AnalysisConfig, Taxonomy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's filter/tag operator family, re-expressed as pure
  * `DataFrame => DataFrame` stages (so batch and Structured Streaming share
  * them unchanged).
  *
  * Everything here stays inside whole-stage codegen: `rlike`/`isin`/
  * `functions.filter` over a literal array — no UDFs, no driver round-trips,
  * so the stages scale linearly with partitions and all predicates remain
  * visible to Catalyst (pushdown, reordering, pruning).
  */
object KeywordOps {

  /** P3 KEYWORD-FILTER — cheap first-pass relevance gate: ANY keyword
    * contained in the text (reference `main.py:284-288` builds one union
    * OR-regex over all ESCAPED literals — i.e. multi-literal containment).
    * One Aho-Corasick pass ([[graft.functions.KeywordMatch]]) instead of a
    * giant regex alternation; with early exit on first hit.
    * Deliberately ordered BEFORE per-industry tagging: the cascade
    * (cheap coarse filter, then detailed classification) is the reference's
    * one real optimization and we keep it structurally. */
  def keywordFilter(df: DataFrame, taxonomy: Taxonomy, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull &&
      size(KeywordMatch.multiKeywordTags(col(textCol), unionTaxonomy(taxonomy))) > 0)

  /** Single-label view of a taxonomy: all keywords under one label, for
    * boolean any-keyword matching with first-hit early exit. */
  private def unionTaxonomy(taxonomy: Taxonomy): Seq[(String, Seq[String])] =
    Seq("any" -> taxonomy.industries.flatMap(_._2).distinct)

  /** P5 ANTI-FILTER (channel blacklist) — case-insensitive NOT IN
    * (reference `main.py:350-352`). For blacklists small enough to inline
    * this compiles to an `In` predicate; use [[blacklistAntiJoin]] when the
    * blacklist is itself a big table. */
  def channelBlacklistFilter(df: DataFrame, cfg: AnalysisConfig): DataFrame =
    if (cfg.channelBlacklist.isEmpty) df
    else df.filter(!lower(col(cfg.posts.channelCol)).isin(cfg.blacklistLower: _*))

  /** Scale path for P5: broadcast LEFT ANTI join against a blacklist
    * relation (for blacklists too large to inline as a literal IN-list). */
  def blacklistAntiJoin(df: DataFrame, blacklist: DataFrame, channelCol: String): DataFrame = {
    val bl = blacklist.select(lower(col(blacklist.columns.head)).as("__bl_channel")).distinct()
    df.join(broadcast(bl), lower(col(channelCol)) === col("__bl_channel"), "left_anti")
  }

  /** P6 ANTI-FILTER (context noise) — drop rows matching the UNESCAPED noise
    * regexes (reference `main.py:208,354-364`; note asymmetry with P3:
    * industry keywords are escaped literals, noise patterns are raw regex). */
  def noiseFilter(df: DataFrame, cfg: AnalysisConfig): DataFrame =
    if (cfg.noisePatterns.isEmpty) df
    else df.filter(!col(cfg.posts.textCol).rlike(cfg.noiseUnionPattern))

  /** The full clean stage = P3 -> P5 -> P6. The reference re-runs this chain
    * in three places (`main.py:347-364,410-421,520-538`); here it is ONE
    * stage that downstream reports share (and may `.cache()`). */
  def clean(df: DataFrame, cfg: AnalysisConfig): DataFrame =
    noiseFilter(channelBlacklistFilter(keywordFilter(df, cfg.taxonomy, cfg.posts.textCol), cfg), cfg)

  /** P4 TAG (multi-label classify), boolean-column form: one `is_<Industry>`
    * BooleanType column per industry (reference `main.py:309-329`), derived
    * from one shared tag-array pass. A post may match several industries —
    * per-industry stats intentionally double-count (SURVEY §7 hard-part
    * (c): keep, don't "fix"). */
  def tagBooleans(df: DataFrame, taxonomy: Taxonomy, textCol: String): DataFrame = {
    val tagged = tagArray(df, taxonomy, textCol)
    taxonomy.industryNames.foldLeft(tagged) { case (acc, ind) =>
      acc.withColumn(s"is_$ind", array_contains(col("industries"), ind))
    }.drop("industries")
  }

  /** P4 TAG, array form: a single `industries` ArrayType(StringType) column
    * of all matched industries — ONE Aho-Corasick pass over the text for
    * the whole taxonomy (vs one regex alternation scan per industry).
    * `explode` replaces the reference's per-industry loop, and one
    * downstream `groupBy` covers all industries in a single shuffle. */
  def tagArray(df: DataFrame, taxonomy: Taxonomy, textCol: String): DataFrame =
    df.withColumn("industries",
      KeywordMatch.multiKeywordTags(col(textCol), taxonomy.industries))

  /** P8 OR-ACROSS-COLUMNS — "globally relevant" mask: any industry matched
    * (reference `main.py:547-550`, `is_Industry1 OR is_Industry2 OR ...`).
    * Semantically identical to the first-pass [[keywordFilter]] (both are
    * "any keyword of any industry hits") — delegated so the two reference
    * call sites stay one implementation. */
  def anyIndustry(df: DataFrame, taxonomy: Taxonomy, textCol: String): DataFrame =
    keywordFilter(df, taxonomy, textCol)

  /** Clean + tag + explode to one row per (post, industry): the shared input
    * of every per-industry report. One pass over the data regardless of the
    * number of industries. */
  def cleanExploded(df: DataFrame, cfg: AnalysisConfig): DataFrame =
    tagArray(clean(df, cfg), cfg.taxonomy, cfg.posts.textCol)
      .withColumn("industry", explode(col("industries")))
      .drop("industries")
}

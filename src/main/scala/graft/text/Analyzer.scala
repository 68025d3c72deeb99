package graft.text

import graft.model.AnalysisConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable text-analysis stage (SURVEY §2 A5 / §7 hard-part (b)).
  *
  * The reference's NLP chain (`main.py:456-513`) is
  * normalize -> tokenize -> POS-tag -> lemmatize -> stopword/length/number/
  * URL filters -> count, built on Hazm (Persian). Hazm has no JVM port, so
  * the chain is behind this trait: the engine tests the PIPELINE SHAPE with a
  * deterministic analyzer; a language-specific analyzer slots in without
  * touching any operator.
  *
  * `tokens` returns a COLUMN expression, not a UDF, wherever possible: the
  * default analyzer is pure `functions._` (split/transform/filter), so the
  * whole word-count pipeline stays inside whole-stage codegen — this is the
  * difference between ~GB/s/core and UDF serialization overhead at 100 TB.
  */
trait Analyzer extends Serializable {
  /** Tokenize + normalize + filter one text column into ArrayType(String). */
  def tokens(text: Column): Column

  /** Generator form: one output ROW per surviving token. Default derives
    * from [[tokens]]; implementations should override with a custom
    * Catalyst Generator when the array form would be re-evaluated by
    * inferred filters (see graft.functions.Generators). */
  def tokenRows(text: Column): Column = explode(tokens(text))
}

/** Deterministic analyzer: lowercase, split on non-alphanumerics, drop
  * short tokens (< minLen), pure-number tokens, and stopwords. Mirrors the
  * reference's token filters (`main.py:488-510`: stopword, length, numeric,
  * URL/noise classes) in a language-neutral way, entirely in codegen'd
  * builtins (no UDF).
  */
final case class SimpleAnalyzer(stopwords: Seq[String], minLen: Int = 2) extends Analyzer {
  override def tokens(text: Column): Column = {
    val raw = split(lower(text), "[^a-z0-9]+")
    val stop = array(stopwords.map(lit): _*)
    filter(
      raw,
      t => length(t) >= minLen && !t.rlike("^[0-9]+$") && !array_contains(stop, t))
  }

  /** Hot-path form: custom Generator — one JVM pass per row, stopword
    * lookup via hash set instead of a per-token linear array scan. Same
    * token semantics as [[tokens]]. */
  override def tokenRows(text: Column): Column =
    graft.functions.Generators.tokenExplode(text, minLen, stopwords)
}

/** A5 WORD-COUNT and friends over any analyzer. */
object TextOps {

  /** Word frequency: explode(analyzer.tokens) -> groupBy(word) -> count ->
    * top-N. One shuffle (the groupBy); partial aggregation reduces each
    * partition's token stream to its local vocabulary before the exchange,
    * so shuffle volume is O(vocab), not O(tokens). */
  def wordFrequency(df: DataFrame, textCol: String, analyzer: Analyzer, topN: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(analyzer.tokenRows(col(textCol)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(topN)

  /** Per-industry word frequency (reference loops industries,
    * `main.py:516-543`; here: one pass, one shuffle, all industries). */
  def wordFrequencyByCategory(
      exploded: DataFrame,
      categoryCol: String,
      textCol: String,
      analyzer: Analyzer,
      topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = exploded
      .filter(col(textCol).isNotNull)
      .select(col(categoryCol).as("category"), analyzer.tokenRows(col(textCol)).as("word"))
      .groupBy("category", "word")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("category")).orderBy(col("n").desc, col("word").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .orderBy(col("category"), col("rk"))
  }

  /** A6 dynamic stopword augmentation (reference `main.py:449-453`: channel
    * usernames are added to the stopword set so channel self-mentions don't
    * dominate word counts). Small-domain distinct -> collect -> new analyzer.
    * The collect is bounded by the channel domain (thousands), not the data.
    */
  def augmentStopwordsWithChannels(
      df: DataFrame,
      channelCol: String,
      cfg: AnalysisConfig): SimpleAnalyzer = {
    val channels = df
      .select(lower(col(channelCol)).cast("string").as("c"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSeq
    SimpleAnalyzer((cfg.stopwords ++ channels).distinct.sorted)
  }
}

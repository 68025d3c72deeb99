package graft.sql

import graft.functions.Generators.{ChunkExplode, NgramExplode, PairsExplode, SegmentExplode, ShingleExplode, TokenExplode, UnicodeTokenExplode}
import graft.functions.KeywordMatch.MultiKeywordTags
import graft.functions.VectorMath.{CosineSimilarity, JaccardSimilarity, L2Squared}
import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for graft's custom Catalyst expressions (SURVEY §3.4: every
  * engine operator reachable from `spark.sql(...)`).
  *
  * Two registration paths, same builders:
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injection, enabled via
  *    `spark.sql.extensions=graft.sql.GraftExtensions` at session build
  *    (the idiomatic deployment path);
  *  - [[GraftFunctions.register]] — runtime registration into an existing
  *    session's function registry.
  *
  * SQL signatures (config args must be literals — they parameterize the
  * expression, they are not data):
  *   shingle_explode(text, w)
  *   token_explode(text, minLen, 'stop,words')
  *   unicode_token_explode(text, minLen, 'stop,words')
  *   multi_keyword_tags(text, 'Label1:kw1,kw2;Label2:kw3')
  *   ngram_explode(text, w)          -- every w-gram occurrence (multiset)
  *   segment_explode(text, k)        -- (seg_idx, seg, ntok) non-overlapping k-token segments
  *   pairs_explode(ids)              -- (a, b) ordered pairs of an id array (or struct array)
  *   nfc_normalize(text)             -- Unicode NFC canonical composition
  *   cosine_similarity(vecA, vecB)   -- unrounded; round(...) in SQL if needed
  *   l2_squared(vecA, vecB)          -- unrounded; round(...) in SQL if needed
  *   jaccard_similarity(setA, setB)  -- unrounded; distinct-element arrays
  */
object GraftFunctions {

  private def litString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: expected a string literal argument, got $e")
  }

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case _ => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $e")
  }

  /** "Label1:kw1,kw2;Label2:kw3" -> taxonomy. */
  private[sql] def parseTaxonomy(spec: String): Seq[(String, Seq[String])] =
    spec.split(";").toSeq.filter(_.nonEmpty).map { part =>
      part.split(":", 2) match {
        case Array(label, kws) => label -> kws.split(",").toSeq.filter(_.nonEmpty)
        case _ => throw new IllegalArgumentException(
          s"multi_keyword_tags: bad taxonomy segment '$part' (want Label:kw1,kw2)")
      }
    }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("shingle_explode"),
      new ExpressionInfo(classOf[ShingleExplode].getName, "shingle_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_explode(text, w)")
        ShingleExplode(args.head, litInt(args(1), "shingle_explode"))
      }),
    (FunctionIdentifier("token_explode"),
      new ExpressionInfo(classOf[TokenExplode].getName, "token_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "token_explode(text, minLen, 'stop,words')")
        TokenExplode(args.head, litInt(args(1), "token_explode"),
          litString(args(2), "token_explode").split(",").toSeq.filter(_.nonEmpty))
      }),
    (FunctionIdentifier("multi_keyword_tags"),
      new ExpressionInfo(classOf[MultiKeywordTags].getName, "multi_keyword_tags"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "multi_keyword_tags(text, 'Label:kw1,kw2;...')")
        MultiKeywordTags(args.head,
          parseTaxonomy(litString(args(1), "multi_keyword_tags")))
      }),
    (FunctionIdentifier("unicode_token_explode"),
      new ExpressionInfo(classOf[UnicodeTokenExplode].getName, "unicode_token_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "unicode_token_explode(text, minLen, 'stop,words')")
        // default normalizer options; the full configuration (lemma map,
        // spacing, repeats) is the Scala UnicodeAnalyzer API
        UnicodeTokenExplode(args.head, graft.text.UnicodeAnalyzer(
          stopwords = litString(args(2), "unicode_token_explode")
            .split(",").toSeq.filter(_.nonEmpty),
          minLen = litInt(args(1), "unicode_token_explode")))
      }),
    (FunctionIdentifier("ngram_explode"),
      new ExpressionInfo(classOf[NgramExplode].getName, "ngram_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngram_explode(text, w)")
        NgramExplode(args.head, litInt(args(1), "ngram_explode"))
      }),
    (FunctionIdentifier("segment_explode"),
      new ExpressionInfo(classOf[SegmentExplode].getName, "segment_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "segment_explode(text, k)")
        SegmentExplode(args.head, litInt(args(1), "segment_explode"))
      }),
    (FunctionIdentifier("pairs_explode"),
      new ExpressionInfo(classOf[PairsExplode].getName, "pairs_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "pairs_explode(ids)")
        PairsExplode(args.head)
      }),
    (FunctionIdentifier("chunk_explode"),
      new ExpressionInfo(classOf[ChunkExplode].getName, "chunk_explode"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "chunk_explode(text, chunk, stride)")
        ChunkExplode(args.head, litInt(args(1), "chunk_explode"),
          litInt(args(2), "chunk_explode"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text)")
        graft.functions.NfcNormalize(args.head)
      }),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(vecA, vecB)")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("l2_squared"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_squared"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "l2_squared(vecA, vecB)")
        L2Squared(args.head, args(1))
      }),
    (FunctionIdentifier("jaccard_similarity"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaccard_similarity(setA, setB)")
        JaccardSimilarity(args.head, args(1))
      })
  )

  /** Register every graft SQL function + optimizer rule into an existing
    * session (`experimental.extraOptimizations` is the runtime rule hook). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      GraftSqlBridge.registerFunction(spark, id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(LiteralRlikeRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LiteralRlikeRule
  }
}

/** `spark.sql.extensions`-pluggable injection of the graft functions and
  * optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => LiteralRlikeRule)
  }
}

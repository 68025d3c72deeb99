package graft.model

/** Keyword taxonomy: ordered industry -> keyword-literals map.
  *
  * Mirrors the reference's `INDUSTRY_KEYWORDS` config
  * (reference `main.py:45-74`): keywords are LITERALS (regex-escaped before
  * matching, `main.py:235`), matching is substring-contains on the text.
  * Ordered `Seq` (not `Map`) so derived patterns/dimension tables are
  * deterministic across runs.
  */
final case class Taxonomy(industries: Seq[(String, Seq[String])]) {

  def industryNames: Seq[String] = industries.map(_._1)

  /** OR-regex over one industry's escaped keyword literals
    * (reference `main.py:223-237`). */
  def patternFor(industry: String): String = {
    val kws = industries.toMap.apply(industry)
    kws.map(RegexUtil.escape).mkString("(", "|", ")")
  }

  /** Union OR-regex over ALL keywords — the cheap first-pass relevance
    * filter (reference `main.py:284-288`, "drastically reduces rows"). */
  def unionPattern: String =
    industries.flatMap(_._2).distinct.map(RegexUtil.escape).mkString("(", "|", ")")

  /** Flat (industry, keyword) pairs — the keyword dimension table used by
    * the single-pass breakdown join (replaces the reference's per-keyword
    * scan loop, `main.py:369-378`). */
  def keywordDim: Seq[(String, String)] =
    for { (ind, kws) <- industries; kw <- kws } yield (ind, kw)
}

object RegexUtil {
  private val special = "\\^$.|?*+()[]{}".toSet

  /** Portable literal-escape (works in both java.util.regex and RE2-style
    * engines, unlike \Q...\E which some dialects lack). */
  def escape(literal: String): String =
    literal.flatMap(c => if (special(c)) s"\\$c" else c.toString)
}

/** Column mapping from an arbitrary posts-shaped table onto the engine's
  * logical post schema (reference schema at `main.py:269-274`:
  * text / full_date / channel_username / views). */
final case class PostsMapping(
    idCol: String,
    textCol: String,
    channelCol: String,
    viewsCol: String,
    tsCol: Option[String] = None
)

/** Full analysis configuration: taxonomy + anti-filter config + stopwords.
  *
  *  - `channelBlacklist`: case-insensitive channel names to drop
  *    (reference `main.py:202-205,350-352`).
  *  - `noisePatterns`: UNESCAPED regexes (reference deliberately does not
  *    escape these, `main.py:208`) ORed into one context anti-filter.
  *  - `stopwords`: static token stoplist for word-frequency
  *    (reference `main.py:141-181`).
  */
final case class AnalysisConfig(
    taxonomy: Taxonomy,
    channelBlacklist: Seq[String],
    noisePatterns: Seq[String],
    stopwords: Seq[String],
    posts: PostsMapping
) {
  def noiseUnionPattern: String = noisePatterns.mkString("(", "|", ")")
  def blacklistLower: Seq[String] = channelBlacklist.map(_.toLowerCase)
}

/** Default configuration targeting the driver testdata `documents` table
  * (vocabulary of 31 synthetic English tokens; see /root/repo/FIXTURES.md).
  * Five industries x 3 keywords mirrors the reference's 5-industry taxonomy
  * shape. `documents` maps text->text, source->channel, n_chars->views.
  */
object Defaults {
  val taxonomy: Taxonomy = Taxonomy(
    Seq(
      "Joins" -> Seq("join", "merge", "hash"),
      "Scans" -> Seq("scan", "filter", "table"),
      "Streaming" -> Seq("stream", "window", "batch"),
      "Storage" -> Seq("column", "row", "sort"),
      "Vectors" -> Seq("vector", "query", "group")
    )
  )

  val documents: PostsMapping =
    PostsMapping(idCol = "doc_id", textCol = "text", channelCol = "source", viewsCol = "n_chars")

  val config: AnalysisConfig = AnalysisConfig(
    taxonomy = taxonomy,
    channelBlacklist = Seq("SRC13", "src7"), // mixed case: exercises case-insensitive compare
    noisePatterns = Seq("slow query", "big\\s+data"),
    stopwords = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it"),
    posts = documents
  )
}

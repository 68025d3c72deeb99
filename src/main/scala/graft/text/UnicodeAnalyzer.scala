package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode/Persian-capable analyzer behind the [[Analyzer]] trait —
  * the engine-native re-expression of the reference's Hazm NLP chain
  * (`/root/reference/main.py:456-513`): normalize → tokenize → lemmatize →
  * strict filters. Hazm has no JVM port, so each Hazm stage maps to a
  * deterministic, engine-mirrorable rule; stages that need a trained model
  * (POS tagging) follow the reference's own fallback path (`main.py:479-486`:
  * tagger absent/failing ⇒ every token passes through, lemmatized).
  *
  * Normalizer options (names mirror `main.py:132-135`):
  *  - `unicodeReplacement`: Arabic-codepoint unification (ي→ی, ك→ک, ة→ه) —
  *    Hazm `unicodes_replacement`.
  *  - `removeDiacritics`: strip Arabic diacritics U+064B–U+065F, U+0670 and
  *    tatweel U+0640 — Hazm `remove_diacritics`/`remove_specials_chars`.
  *  - `correctSpacing`: attach detached Persian affixes (ها/های/تر/ترین)
  *    to the preceding word with ZWNJ (U+200C) — Hazm `correct_spacing`.
  *    Column-form only option (Java-regex lookahead); the Generator form
  *    implements it imperatively with identical semantics.
  *  - `decreaseRepeatedChars`: collapse 3+ repeats of a letter to one —
  *    Hazm `decrease_repeated_chars` ("عالییییی"→"عالی"). Uses a regex
  *    backreference, which RE2-family oracles lack — keep OFF in
  *    oracle-checked queries; pinned by unit tests instead.
  *
  * Tokenization: letters, digits and ZWNJ are word characters
  * (`[^\p{L}\p{N}‌]+` splits) — ZWNJ-joined forms like کتاب‌ها stay
  * ONE token, mirroring the reference's charset class `main.py:503`.
  *
  * Lemmatization: a pluggable literal map standing in for Hazm's
  * `Lemmatizer`; values may carry Hazm's `past#present` verb convention and
  * the reference's `split('#')[0]` rule is applied (`main.py:477`).
  *
  * Strict filters (`main.py:488-510`, conjunctive so order-free):
  * stopword (lowercased compare) + min length; any-digit drop; web/id
  * substrings; charset `^[آ-یa-zA-Z‌]+$`; pure-ASCII tokens longer
  * than `asciiMaxLen` or in the noise list. Output keeps original case
  * (the reference counts unlowercased tokens).
  */
final case class UnicodeAnalyzer(
    stopwords: Seq[String],
    minLen: Int = 3,
    lemmas: Map[String, String] = Map.empty,
    unicodeReplacement: Boolean = true,
    removeDiacritics: Boolean = true,
    correctSpacing: Boolean = false,
    decreaseRepeatedChars: Boolean = false,
    webNoise: Seq[String] = UnicodeAnalyzer.WebNoise,
    asciiNoise: Seq[String] = UnicodeAnalyzer.AsciiNoise,
    asciiMaxLen: Int = 7) extends Analyzer {

  import UnicodeAnalyzer._

  private def normalize(text: Column): Column = {
    var t = text
    if (correctSpacing)
      t = regexp_replace(t, SpacingPattern, "$1‌$2")
    if (unicodeReplacement) t = translate(t, CharMapFrom, CharMapTo)
    if (removeDiacritics) t = regexp_replace(t, DiacriticsClass, "")
    if (decreaseRepeatedChars) t = regexp_replace(t, "(\\p{L})\\1{2,}", "$1")
    t
  }

  private def lemma(w: Column): Column =
    if (lemmas.isEmpty) w
    else {
      val lm = map(lemmas.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      substring_index(coalesce(element_at(lm, w), w), "#", 1)
    }

  private def keep(w: Column): Column = {
    val wl = lower(w)
    val stop = array(stopwords.map(s => lit(s.toLowerCase(java.util.Locale.ROOT))): _*)
    val isWeb = webNoise.map(n => wl.contains(n)).reduce(_ || _)
    val asciiDrop = w.rlike(AsciiOnlyPattern) &&
      (length(w) > asciiMaxLen || wl.isInCollection(asciiNoise.map(_.toLowerCase(java.util.Locale.ROOT))))
    length(w) >= minLen && !array_contains(stop, wl) &&
      !w.rlike(AnyDigitPattern) && !isWeb && w.rlike(CharsetPattern) && !asciiDrop
  }

  override def tokens(text: Column): Column =
    filter(transform(split(normalize(text), TokenSplitPattern), lemma(_)), keep(_))

  /** Hot-path form: custom Generator — one JVM pass per row, hash-set
    * stopword/lemma lookup, no inferred-filter re-evaluation (see
    * graft.functions.Generators). Same token semantics as [[tokens]]. */
  override def tokenRows(text: Column): Column =
    graft.functions.Generators.unicodeTokenExplode(text, this)
}

object UnicodeAnalyzer {
  /** Reference web/id markers (`main.py:501`). After tokenization only the
    * alphanumeric ones can still match, but the full list is kept for
    * fidelity (substring compare on the lowercased token). */
  val WebNoise: Seq[String] = Seq("http", "www", ".com", ".ir", "@", "id:", "bot")
  /** Reference English-noise usernames (`main.py:507`). */
  val AsciiNoise: Seq[String] = Seq("landing", "saamim", "click", "join", "admin")

  val CharMapFrom = "يكة"
  val CharMapTo = "یکه"
  // harakat U+064B–U+065F, superscript alef U+0670, tatweel U+0640 —
  // written explicitly: a literal range from harakat to superscript alef
  // would span the Arabic-Indic digits (U+0660–U+0669) by accident
  val DiacriticsClass = "[ً-ٰٟـ]"
  val TokenSplitPattern = "[^\\p{L}\\p{N}‌]+"
  val CharsetPattern = "^[آ-یa-zA-Z‌]+$"
  val AsciiOnlyPattern = "^[a-zA-Z]+$"
  val AnyDigitPattern = "\\p{N}"
  /** Detached-affix spacing: letter + space + affix not followed by more
    * letters ⇒ letter + ZWNJ + affix. */
  val SpacingPattern = "(\\p{L}) (ها|های|تر|ترین)(?![\\p{L}‌])"
  val Affixes: Seq[String] = Seq("ها", "های", "تر", "ترین")
}

package graft

import graft.text.UnicodeAnalyzer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Unicode/Persian analyzer semantics the reference's Hazm chain
  * defines (normalize → tokenize → lemmatize → strict filters,
  * main.py:456-513), including the options the DuckDB oracle cannot mirror
  * (correctSpacing, decreaseRepeatedChars — RE2 has no lookaround or
  * backreferences). */
class UnicodeAnalyzerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = UnicodeAnalyzer(stopwords = Seq("و", "هستند", "the"))

  private def tok(a: UnicodeAnalyzer, texts: String*): Seq[Seq[String]] = {
    import spark.implicits._
    texts.map(Tuple1(_)).toDF("t")
      .select(a.tokens(col("t")).as("w"))
      .collect().map(_.getSeq[String](0).toList).toSeq
  }

  test("ZWNJ-joined forms are ONE token; charset admits Persian+ASCII+ZWNJ only") {
    val out = tok(base, "کتاب‌ها خوب هستند", "mixed русский کتاب")
    assert(out(0) == Seq("کتاب‌ها", "خوب")) // هستند is a stopword
    assert(out(1) == Seq("mixed", "کتاب")) // Cyrillic fails the charset class
  }

  test("correctSpacing attaches detached affixes with ZWNJ") {
    val a = base.copy(correctSpacing = true)
    assert(tok(a, "کتاب ها خوب")(0) == Seq("کتاب‌ها", "خوب"))
    // affix followed by more letters is NOT an affix occurrence
    assert(tok(a, "کتاب هایی")(0) == Seq("کتاب", "هایی"))
  }

  test("unicodeReplacement unifies Arabic codepoints; removeDiacritics strips harakat") {
    // Arabic yeh/kaf forms normalize to the Persian codepoints
    assert(tok(base, "علي ملك")(0) == Seq("علی", "ملک"))
    assert(tok(base, "سلامٌ عزیزً")(0) == Seq("سلام", "عزیز"))
    val off = base.copy(unicodeReplacement = false)
    // the reference's charset range آ-ی (U+0622–U+06CC) admits the Arabic
    // yeh codepoint too — without unification the token keeps the Arabic
    // form, i.e. علي and علی would COUNT SEPARATELY (the bug unification
    // exists to fix); with it both normalize to one spelling
    assert(tok(off, "علي")(0) == Seq("علي"))
    assert(tok(base, "علي علی")(0) == Seq("علی", "علی"))
  }

  test("decreaseRepeatedChars collapses 3+ letter runs") {
    val a = base.copy(decreaseRepeatedChars = true)
    assert(tok(a, "عالییییی coool")(0) == Seq("عالی", "col"))
    assert(tok(base, "عالییییی")(0) == Seq("عالییییی"))
  }

  test("lemma map applies with the # past-present convention") {
    val a = base.copy(lemmas = Map("رفت" -> "رفت#رو", "کتاب‌ها" -> "کتاب"))
    assert(tok(a, "رفت کتاب‌ها")(0) == Seq("رفت", "کتاب"))
  }

  test("strict filters: length, digits, web markers, ASCII noise") {
    val out = tok(base,
      "ab abc عدد۱۲ abc123 httpxyz mybot extraordinary useful Admin click کتاب")
    assert(out(0) == Seq("abc", "useful", "کتاب"))
    // ab: len<3; عدد۱۲/abc123: \p{N}; httpxyz/mybot: web substrings;
    // extraordinary: ASCII len>7; Admin/click: ASCII noise list (case-insensitive)
  }

  test("property: Column form and Generator form emit identical token multisets") {
    import spark.implicits._
    val a = base.copy(lemmas = Map("رفت" -> "رفت#رو", "کتاب‌ها" -> "کتاب"))
    val texts = Seq(
      "کتاب‌ها خوب هستند و عالی", "كتاب‌هاي قدیمی رفت", "سلامٌ دوست admin",
      "useful extraordinary abc123 httpx", "", "   ", "۱۲۳ فقط عدد",
      "mixed فارسی english کتاب‌ها رفت رفت")
    val df = texts.map(Tuple1(_)).toDF("t")
    val cols = df.select(explode(a.tokens(col("t"))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gen = df.select(a.tokenRows(col("t")).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cols == gen)
    assert(cols.nonEmpty)
  }
}

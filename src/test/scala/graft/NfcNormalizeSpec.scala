package graft

import graft.functions.NfcNormalize
import graft.ops.TextAnalysisOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NFC canonicalization: composition semantics, the full canonicalize
  * chain (controls → spaces → collapse → trim), null safety, and the
  * SQL registration. All non-ASCII is written as \\u escapes so source
  * encoding cannot silently pre-normalize the fixtures. */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val composedE = "café" // é precomposed
  private val decomposedE = "café" // e + combining acute

  test("combining marks compose to precomposed codepoints; NFC text is unchanged") {
    import spark.implicits._
    val out = Seq(
      (decomposedE, composedE),
      (composedE, composedE),
      ("ÅB", "ÅB"), // A + ring -> Å
      ("ascii only", "ascii only")
    ).toDF("raw", "want")
      .withColumn("got", NfcNormalize.nfcCol(col("raw")))
      .collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"nfc(${r.getString(0)})"))
  }

  test("ZWNJ survives NFC (Persian morphology depends on it)") {
    import spark.implicits._
    val zwnj = "می‌روم" // mi-ZWNJ-ravam
    val got = Seq(Tuple1(zwnj)).toDF("t")
      .select(NfcNormalize.nfcCol(col("t"))).head.getString(0)
    assert(got == zwnj)
  }

  test("canonicalize: controls become spaces, runs collapse, edges trim, flag fires") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\tb  c "),
      (2L, "plain text"),
      (3L, "double  space"),
      (4L, decomposedE)
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.canonicalize(df, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("changed")))).toMap
    assert(out(1L) == (("a b c", 1L)))
    assert(out(2L) == (("plain text", 0L)))
    assert(out(3L) == (("double space", 1L)))
    assert(out(4L) == ((composedE, 1L)))
  }

  test("null text rows are dropped; nfc of null is null") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextAnalysisOps.canonicalize(df, "text").count() == 1L)
    val viaExpr = df.select(NfcNormalize.nfcCol(col("text")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(viaExpr.count(_.isEmpty) == 1)
  }

  test("nfc_normalize is callable from SQL") {
    graft.sql.GraftFunctions.register(spark)
    val got = spark.sql("SELECT nfc_normalize('café') AS t").head.getString(0)
    assert(got == composedE)
  }
}

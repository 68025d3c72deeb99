package graft

import graft.sql.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql(...) surface: registered tables + custom functions. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom functions are callable from SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "alpha beta gamma alpha beta the 42"))
      .toDF("id", "text").createOrReplaceTempView("sql_surface_docs")

    val sh = spark.sql(
      "SELECT shingle_explode(text, 2) AS s FROM sql_surface_docs")
      .collect().map(_.getString(0)).toSet
    assert(sh == Set("alpha beta", "beta gamma", "gamma alpha", "beta the", "the 42"))

    val toks = spark.sql(
      "SELECT token_explode(text, 2, 'the,a') AS t FROM sql_surface_docs")
      .collect().map(_.getString(0)).toList
    assert(toks == List("alpha", "beta", "gamma", "alpha", "beta")) // stopword + digits dropped

    val tags = spark.sql(
      "SELECT multi_keyword_tags(text, 'Greek:beta,delta;Latin:qq') AS g FROM sql_surface_docs")
      .collect().map(_.getSeq[String](0).toList)
    assert(tags.head == List("Greek"))
  }

  test("registerAll makes every engine table reachable from SQL") {
    graft.io.Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT COUNT(*) FROM documents").collect().head.getLong(0) > 0)
    assert(spark.sql(
      "SELECT l_returnflag, SUM(l_quantity) FROM lineitem GROUP BY 1").collect().nonEmpty)
  }
}

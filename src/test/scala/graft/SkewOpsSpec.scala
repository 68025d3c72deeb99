package graft

import graft.io.Tables
import graft.ops.SkewOps
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("salted join equals plain join and shuffles on (key, salt)") {
    val orders = Tables.orders(spark, sf).withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "custkey")
    val plain = orders.join(customer, Seq("custkey")).count()
    val salted = SkewOps.saltedJoin(orders, customer, "custkey", nSalts = 4)
    assert(salted.count() == plain)
    assert(salted.columns.count(_ == "__salt") == 0)
  }

  test("left salted join keeps unmatched left rows exactly once") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (99, "no-match")).toDF("k", "lv")
    val r = Seq((1, "x"), (2, "y")).toDF("k", "rv")
    val out = SkewOps.saltedJoin(l, r, "k", nSalts = 8, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter($"k" === 99 && $"rv".isNull).count() == 1)
  }
}

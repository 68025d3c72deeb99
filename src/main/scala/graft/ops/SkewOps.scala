package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution has hot keys.
  *
  * Division of labor at scale:
  *  - skewed SHUFFLE JOINS: AQE's runtime skew-split handles these
  *    (`spark.sql.adaptive.skewJoin`, on in [[graft.GraftSession]]);
  *  - skewed AGGREGATIONS: hash aggregation already does map-side partial
  *    aggregation, which collapses hot keys before the exchange;
  *  - what remains is the PLANNED salted join: when the build side cannot
  *    be broadcast, inputs are bucketed/sorted (AQE cannot re-split them),
  *    or the skew is known a priori — spread each hot key over `nSalts`
  *    shuffle partitions by salting the probe side and replicating the
  *    build side.
  */
object SkewOps {

  /** Salted equi-join on `key`: the (skewed) left side gets a uniform
    * random salt; the right side is replicated once per salt value, so a
    * hot key's rows land on `nSalts` reducers instead of one.
    *
    * Only `inner` and `left` semantics are sound under replication (an
    * unmatched right row would surface `nSalts` times in a right/full
    * outer join), so the join type is restricted. Right-side replication
    * multiplies shuffle volume by `nSalts` — size it to the skew factor,
    * not higher. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, "nSalts must be >= 1")
    require(Set("inner", "left", "left_outer")(joinType),
      s"salted join supports inner/left only, got $joinType")
    val salted = left.withColumn("__salt", floor(rand(7) * nSalts).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

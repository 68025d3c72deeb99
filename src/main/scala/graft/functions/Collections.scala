package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-column helpers shared across operator families. */
object Collections {

  /** All ordered pairs (a, b) with a before b from a SORTED id array:
    * the bucket-local pair expansion used by every LSH family
    * (MinHash bands, hyperplane buckets). Pure `functions._` — stays in
    * the plan, no UDF. */
  def orderedPairs(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        b => struct(a.as("a"), b.as("b")))))
}

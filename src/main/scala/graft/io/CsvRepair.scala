package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S2 `CSV-SCAN` (repairing) — re-expression of the reference's cache
  * loader (reference `main.py:994-1047`): the cached CSV may contain
  * literal backslash-n sequences inside quoted fields (written by a buggy
  * exporter); the reference slurps the whole file into driver RAM and
  * string-replaces before parsing (`main.py:1003-1008`).
  *
  * Spark-native restructuring: each damaged record is still ONE physical
  * line (the newlines are literal `\n` two-char sequences, not real line
  * breaks), so `spark.read.text` distributes the file, `regexp_replace`
  * repairs per-line, and `from_csv` parses — no whole-file-in-RAM, scales
  * to any file size, splittable input.
  *
  * Lenient coercion semantics preserved exactly (`main.py:1036-1042`):
  * un-parseable timestamp -> row dropped; un-parseable views -> 0.
  */
object CsvRepair {

  /** Read a (possibly damaged) headered CSV with the given schema. The
    * schema's column order must match the file's header order. Malformed
    * lines are dropped (PERMISSIVE parse -> null struct -> filter), like
    * the reference's `on_bad_lines='skip'` (`main.py:1014`). */
  def readRepaired(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read.text(path)
    val header = schema.fieldNames.mkString(",")
    val parsed = raw
      .filter(col("value") =!= header)
      // literal backslash-n inside quoted fields -> a space (the reference
      // turns them into real newlines then strips them again for snippets;
      // a single-space replacement keeps records one-line and text intact)
      .withColumn("value", regexp_replace(col("value"), "\\\\n", " "))
      .select(from_csv(col("value"),
        schema,
        Map("mode" -> "PERMISSIVE", "header" -> "false")).as("r"))
      .select(col("r.*"))
    // PERMISSIVE yields all-null rows for garbage lines: drop rows where
    // every field is null
    parsed.filter(schema.fieldNames.map(col(_).isNotNull).reduce(_ || _))
  }

  /** Posts-table coercion (reference `main.py:1036-1042`): parse the
    * timestamp column leniently (null on failure -> row DROPPED) and
    * default the numeric views column to 0 on failure. */
  def coercePosts(df: DataFrame, tsCol: String, viewsCol: String): DataFrame =
    df
      // try_* variants: ANSI mode (Spark 4 default) makes plain cast THROW
      // on malformed input; the reference's errors='coerce' means null-out
      .withColumn(tsCol, try_to_timestamp(col(tsCol)))
      .filter(col(tsCol).isNotNull)
      .withColumn(viewsCol, coalesce(col(viewsCol).try_cast("long"), lit(0L)))
}

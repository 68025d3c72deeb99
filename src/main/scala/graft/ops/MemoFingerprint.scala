package graft.ops

import org.apache.spark.sql.DataFrame

/** Cheap CONTENT identity for the session-scoped materialized-artifact
  * memos ([[RetrievalOps.moreLikeThisShared]],
  * [[GraphOps.symmetricEdgesShared]], [[CurationOps.curationFunnel]]'s
  * stage prefix): folding this into the memo key makes staleness
  * STRUCTURALLY impossible — a caller that reuses a `sourceKey` string
  * after the backing data changed gets a different key and a fresh
  * computation, instead of a silently stale relation served on the
  * caller's word.
  *
  * The id is plan-only (nothing executes): for file-source relations,
  * md5 over the SORTED backing-file list — parquet mutations rewrite or
  * add part files under fresh names, so any append/overwrite/compaction
  * changes the set; for non-file relations (in-memory test frames,
  * views), the analyzed plan's `semanticHash`, which changes whenever
  * the producing plan does. Cost is one file-index listing the session's
  * `FileIndex` cache already holds for scanned relations — no data read,
  * no job.
  */
private[graft] object MemoFingerprint {

  def of(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.nonEmpty) {
      val md = java.security.MessageDigest.getInstance("MD5")
      // NUL separator: the one byte a filesystem path cannot contain,
      // so the concatenation is unambiguous ("a b"+"c" vs "a"+"b c")
      md.update(files.sorted.mkString("\u0000").getBytes("UTF-8"))
      md.digest().map("%02x".format(_)).mkString
    } else s"plan:${df.queryExecution.analyzed.semanticHash()}"
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10): image/audio/video content
  * travels as opaque `binary` columns with a typed metadata struct; heavy
  * per-item work (decode, feature extraction, resize, frame sampling) runs
  * as batched per-partition loops over typed Datasets — the JVM analogue of
  * arrow-batched Python UDFs: one iterator pass per partition, no
  * per-row closure dispatch, library handles initialized once per
  * partition.
  *
  * The actual media DECODE is STUBBED (this environment has no image/audio
  * codecs): `decodeStub` produces a deterministic fake "decoded frame" from
  * the bytes. Everything around it — schema, batching, partitioning,
  * feature shape — is real and tested; swapping in a real codec changes
  * only the marked function body.
  */
object MultimodalOps {

  /** Typed metadata carried next to the binary payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

  /** One media item: opaque bytes + typed metadata. */
  final case class MediaRow(mediaId: Long, modality: String, content: Array[Byte], meta: MediaMeta)

  /** Extracted features: byte stats + a fixed-dim embedding-like vector. */
  final case class MediaFeatures(
      mediaId: Long, modality: String, nBytes: Long, checksum: Long, feature: Array[Float])

  // ---- STUB: deterministic fake decode ----------------------------------
  // A real implementation would decode `content` with an image/audio codec
  // and return pixel/sample data. The fake is a stable function of the
  // bytes so tests are deterministic and the downstream plumbing is
  // exercised with realistic shapes.
  private[graft] def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: one partition = one iterator pass.
    * Per-partition (not per-row) setup mirrors real codec/model loading. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init goes here (codec contexts, model weights, ...)
      rows.map { r =>
        var checksum = 0L
        var i = 0
        while (i < r.content.length) { checksum = (checksum * 31 + (r.content(i) & 0xff)) & 0x7fffffffL; i += 1 }
        MediaFeatures(r.mediaId, r.modality, r.content.length.toLong, checksum,
          decodeStub(r.content, dim))
      }
    }
  }

  /** "Resize" shape: map each payload to a fixed target byte budget and
    * update the metadata dims accordingly — the plumbing of an image
    * resize (payload transform + metadata rewrite in one typed map).
    * STUB: real code would decode, scale, re-encode; the fake samples the
    * byte stream proportionally (deterministic). */
  def resizeMedia(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val budget = math.max(1, targetW * targetH / 64)
    media.map { r =>
      val n = r.content.length
      val out =
        if (n <= budget) r.content
        else Array.tabulate(budget)(i => r.content((i.toLong * n / budget).toInt))
      r.copy(content = out,
        meta = r.meta.copy(width = targetW, height = targetH))
    }
  }

  /** "Frame sampling" shape: emit every `stride`-th fixed-size window of
    * the payload as its own row (media_id, frame_no, frame_bytes) — the
    * plumbing a video pipeline needs (one input row fans out to N frames).
    * Uses flatMap on the typed Dataset: fan-out without driver involvement. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Iterator.range(0, math.max(0, r.content.length - frameSize + 1), stride).map { off =>
        (r.mediaId, off / stride, r.content.slice(off, off + frameSize))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Build a deterministic fake media corpus from the documents table:
    * utf-8 bytes of text play the role of an undecodable payload. Keeps the
    * whole multimodal path runnable on the standard testdata. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id").as("mediaId"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          lit("fake").as("format"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") * 10).cast("long").as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /** Frame-sampling summary — the oracle-checked entry point for
    * [[sampleFrames]]'s fan-out path: every `stride`-th `frameSize`-byte
    * window of each payload gets the engine's rolling checksum, aggregated
    * per modality. The flatMap fan-out (one media row → N frame rows) and
    * the per-frame byte loop are exactly what a real video pipeline does
    * between demux and per-frame inference. */
  def frameSummary(
      spark: SparkSession, docs: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    val frames = fromDocuments(spark, docs).flatMap { r =>
      Iterator.range(0, math.max(0, r.content.length - frameSize + 1), stride).map { off =>
        var c = 0L
        var i = off
        while (i < off + frameSize) { c = (c * 31 + (r.content(i) & 0xff)) & 0x7fffffffL; i += 1 }
        (r.modality, c)
      }
    }.toDF("modality", "cs")
    frames
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_frames"),
        min(col("cs")).as("min_checksum"),
        max(col("cs")).as("max_checksum"))
      .orderBy("modality")
  }

  /** Per-modality feature summary — the query-shaped entry point:
    * byte/checksum stats per modality, deterministic ordering. */
  def modalitySummary(spark: SparkSession, docs: DataFrame, dim: Int): DataFrame = {
    val feats = extractFeatures(fromDocuments(spark, docs), dim)
    feats.toDF()
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("nBytes")).as("total_bytes"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum"))
      .orderBy("modality")
  }
}

package graft

import graft.io.Tables
import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("resize caps payload size and rewrites metadata dims") {
    val media = MultimodalOps.fromDocuments(spark, Tables.documents(spark, sf))
    val resized = MultimodalOps.resizeMedia(media, targetW = 32, targetH = 32).collect()
    val budget = 32 * 32 / 64
    val orig = media.collect().map(r => r.mediaId -> r.content.length).toMap
    assert(resized.length == orig.size)
    resized.foreach { r =>
      assert(r.content.length == math.min(orig(r.mediaId), budget))
      assert(r.meta.width == 32 && r.meta.height == 32)
    }
  }

  test("feature extraction preserves row count and emits fixed-dim vectors") {
    val media = MultimodalOps.fromDocuments(spark, Tables.documents(spark, sf))
    val feats = MultimodalOps.extractFeatures(media, dim = 16).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.feature.length == 16)
      assert(f.nBytes > 0)
      assert(f.checksum >= 0 && f.checksum <= 0x7fffffffL)
    }
  }

  test("decode stub is deterministic") {
    val bytes = "hello media".getBytes("UTF-8")
    assert(MultimodalOps.decodeStub(bytes, 8).toSeq == MultimodalOps.decodeStub(bytes, 8).toSeq)
  }

  test("frame sampling fans out with stride and fixed frame size") {
    val media = MultimodalOps.fromDocuments(spark, Tables.documents(spark, sf))
    val frames = MultimodalOps.sampleFrames(media, frameSize = 16, stride = 8)
    val rows = frames.filter("media_id = 0").orderBy("frame_no").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Array[Byte]]("frame_bytes").length == 16))
    assert(rows.map(_.getInt(1)).toSeq == rows.indices)
  }

  test("frame summary counts match the sampling arithmetic") {
    val docs = Tables.documents(spark, sf)
    val out = MultimodalOps.frameSummary(spark, docs, frameSize = 32, stride = 24).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    // total frames = sum over docs of the exclusive-stop stride count
    import org.apache.spark.sql.functions._
    val expected = docs.filter(col("text").isNotNull)
      .select(length(col("text")).as("n")).collect()
      .map(r => math.max(0, (r.getInt(0) - 32 + 1 + 23) / 24)).map(_.toLong).sum
    assert(out.map(_.getLong(1)).sum == expected)
    out.foreach(r => assert(r.getLong(2) <= r.getLong(3))) // min <= max checksum
  }

  test("modality summary partitions the corpus into three modalities") {
    val out = MultimodalOps.modalitySummary(spark, Tables.documents(spark, sf), 16).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(out.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
  }
}

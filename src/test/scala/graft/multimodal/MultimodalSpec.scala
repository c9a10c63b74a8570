package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val media = {
    import spark.implicits._
    Seq(
      ("png1", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)),
      ("jpg1", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x00, 9)),
      ("wav1", Array[Byte](0x52, 0x49, 0x46, 0x46, 5, 5)),
      ("raw1", Array[Byte](1, 2, 3, 4)),
      ("none", null)
    ).toDF("media_id", "data")
  }

  test("mime sniffing from magic bytes") {
    val got = Multimodal.withMediaMeta(media, "data")
      .select(col("media_id"), col("media_meta.mime"), col("media_meta.byte_len"))
      .collect().map(r => r.getString(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(got("png1") == (Some("image/png"), 7L))
    assert(got("jpg1") == (Some("image/jpeg"), 5L))
    assert(got("wav1") == (Some("audio/wav"), 6L))
    assert(got("raw1") == (Some("application/octet-stream"), 4L))
    assert(got("none") == (None, 0L))
  }

  test("stub decode: deterministic features, null payload -> null features") {
    val out = Multimodal.stubDecodeFeatures(media, "data", featureDim = 4)
    val rows = out.select("media_id", "features").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Float](1))).toMap
    assert(rows("none").isEmpty)
    assert(rows("png1").get.length == 4)
    // determinism across runs
    val again = Multimodal.stubDecodeFeatures(media, "data", featureDim = 4)
      .select("media_id", "features").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Float](1))).toMap
    assert(rows == again)
  }

  test("real decode: luma-histogram features for decodable images, null for junk") {
    import spark.implicits._
    val withReal = Seq(
      ("img1", graft.functions.ImageFixtures.syntheticPng(1L, 0)),
      ("img2", graft.functions.ImageFixtures.syntheticPng(2L, 0)),
      ("junk", Array[Byte](1, 2, 3, 4)),
      ("none", null)
    ).toDF("media_id", "data")
    val rows = Multimodal.decodeFeatures(withReal, "data", featureDim = 8)
      .select("media_id", "features").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Float](1))).toMap
    assert(rows("none").isEmpty)
    assert(rows("junk").isEmpty) // undecodable -> null, never a throw
    assert(rows("img1").get.length == 8)
    assert(math.abs(rows("img1").get.map(_.toDouble).sum - 1.0) < 1e-5)
    assert(rows("img1") != rows("img2")) // pixels, not payload moments
    // agrees with the kernel called directly (same decode path)
    val direct = graft.functions.ImageKernels.lumaHistogram(
      graft.functions.ImageFixtures.syntheticPng(1L, 0), 8)
    assert(rows("img1").get == direct.toSeq)
  }

  test("frame sampling emits n offsets per payload, within bounds") {
    val out = Multimodal.sampleFrames(media.filter(col("data").isNotNull), "data", n = 3)
    val grouped = out.select("media_id", "frame_idx", "byte_offset").collect()
      .groupBy(_.getString(0))
    assert(grouped.forall(_._2.length == 3))
    grouped("png1").foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < 7)
    }
  }
}

package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{VideoFixtures, VideoKernels}

class VideoDedupSpec extends AnyFunSuite with SparkTestBase {

  test("AVI container walk: frame chunks located, word alignment honored, junk -> null") {
    val avi = VideoFixtures.syntheticAvi(5L, 0, frames = 6)
    val chunks = VideoKernels.aviFrameChunks(avi)
    assert(chunks != null && chunks.length == 6)
    // each located chunk is a decodable frame with the planted dims
    chunks.foreach { case (off, len) =>
      val img = graft.functions.ImageKernels.decode(
        java.util.Arrays.copyOfRange(avi, off, off + len))
      assert(img != null && img.getWidth == 32)
    }
    assert(VideoKernels.aviFrameChunks("junk".getBytes) == null)
    assert(VideoKernels.aviFrameChunks(null) == null)
    // a WAV (RIFF but not AVI) is refused
    assert(VideoKernels.aviFrameChunks(
      graft.functions.AudioFixtures.syntheticWav(1L, 0)) == null)
  }

  test("interleaved AVIs: frames inside LIST('rec ') groups are found, in stream order") {
    // hand-assemble RIFF('AVI ')/LIST('movi') wrapping each frame in its
    // own LIST('rec ') — the published interleaving layout
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val frames = (0 until 3).map(f =>
      graft.functions.ImageFixtures.syntheticPng(900L + f, 0))
    def chunk(tag: String, body: Array[Byte]) =
      tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val recs = frames.map(p => chunk("LIST", "rec ".getBytes("US-ASCII") ++
      chunk("00dc", p))).reduce(_ ++ _)
    val movi = "movi".getBytes("US-ASCII") ++ recs
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    val chunks = VideoKernels.aviFrameChunks(avi)
    assert(chunks != null && chunks.length == 3, "rec-wrapped frames must be found")
    // stream order preserved across sibling rec groups
    chunks.zipWithIndex.foreach { case ((off, len), i) =>
      val h = graft.functions.ImageKernels.phash64(
        java.util.Arrays.copyOfRange(avi, off, off + len))
      assert(h == graft.functions.ImageKernels.phash64(frames(i)), s"frame $i")
    }
    // a crafted tower of nested lists neither recurses unboundedly nor
    // hangs: depth cap stops the descent, the walk returns (null here —
    // no frames above the cap)
    var tower = chunk("00dc", frames.head)
    (0 until 200).foreach { _ =>
      tower = chunk("LIST", "rec ".getBytes("US-ASCII") ++ tower)
    }
    val deep = "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + 4 + tower.length) ++
      "AVI ".getBytes("US-ASCII") ++
      chunk("LIST", "movi".getBytes("US-ASCII") ++ tower)
    val _ = VideoKernels.aviFrameChunks(deep) // must neither throw nor hang
  }

  test("frame sampling: even coverage, caps at available frames, per-frame pHash real") {
    val avi = VideoFixtures.syntheticAvi(7L, 0, frames = 6)
    val h4 = VideoKernels.framePhashes(avi, 4)
    assert(h4 != null && h4.numElements() == 4)
    val h99 = VideoKernels.framePhashes(avi, 64)
    assert(h99.numElements() == 6) // caps at available
    // first and last frames included; hashes agree with direct decode
    val chunks = VideoKernels.aviFrameChunks(avi)
    val first = graft.functions.ImageKernels.phash64(
      java.util.Arrays.copyOfRange(avi, chunks.head._1,
        chunks.head._1 + chunks.head._2))
    assert(h4.getLong(0) == first.longValue())
  }

  test("copies share the hash sequence; frame-level near-dups stay within radius; distinct far") {
    def hashes(seed: Long, v: Int): Seq[Long] = {
      val a = VideoKernels.framePhashes(VideoFixtures.syntheticAvi(seed, v), 4)
      (0 until a.numElements()).map(a.getLong)
    }
    (0L until 50L).foreach { s =>
      assert(hashes(s, 0) == hashes(s, 0)) // deterministic
      val base = hashes(s, 0); val near = hashes(s, 1)
      assert(base.size == near.size)
      base.zip(near).foreach { case (x, y) =>
        assert(java.lang.Long.bitCount(x ^ y) <= 3, s"seed $s")
      }
    }
    val h0 = hashes(1L, 0); val h1 = hashes(2L, 0)
    h0.zip(h1).foreach { case (x, y) =>
      assert(java.lang.Long.bitCount(x ^ y) > 12)
    }
  }

  private def vids(ids: Seq[Long], seedOf: Long => Long,
      variantOf: Long => Int = _ => 0): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, VideoFixtures.syntheticAvi(seedOf(i), variantOf(i))))
      .toDF("id", "vid")
  }

  test("candidate pairs find exactly the planted re-encodes; dedup keeps bases + junk") {
    import spark.implicits._
    // 20 originals; 210..214 are frame-level re-encodes of 10..14
    val df = vids(0L until 20L, identity)
      .unionByName(vids(210L until 215L, _ - 200L, _ => 1))
    val pairs = VideoDedup.videoCandidatePairs(df, "id", "vid")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (10L until 15L).map(i => (i, i + 200L)).toSet)
    val junk = Seq((900L, "not a video".getBytes)).toDF("id", "vid")
    val kept = VideoDedup.dedupNearVideos(df.unionByName(junk), "id", "vid")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 20L).toSet + 900L)
  }
}

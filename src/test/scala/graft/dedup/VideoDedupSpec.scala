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

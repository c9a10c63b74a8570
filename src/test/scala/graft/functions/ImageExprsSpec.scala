package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ImageExprsSpec extends AnyFunSuite with SparkTestBase {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("planted PNG fixtures decode through the REAL ImageIO codec with planted dims") {
    val base = ImageFixtures.syntheticPng(42L, 0)
    val near = ImageFixtures.syntheticPng(42L, 1)
    val imgB = ImageKernels.decode(base)
    val imgN = ImageKernels.decode(near)
    assert(imgB != null && imgB.getWidth == 32 && imgB.getHeight == 32)
    assert(imgN != null && imgN.getWidth == 64 && imgN.getHeight == 64)
    // the 2x nearest upscale + brightness: every 2x2 block constant,
    // each pixel exactly base+4 (clamp-free by construction)
    val lb = ImageKernels.lumaResample(imgB, 32, 32)
    val ln = ImageKernels.lumaResample(imgN, 32, 32)
    (0 until 32 * 32).foreach { i =>
      assert(math.abs(ln(i) - lb(i) - 4.0) < 1e-9, s"pixel $i")
    }
  }

  test("fixture bytes are deterministic and seed/variant-sensitive") {
    assert(ImageFixtures.syntheticPng(7L, 0).sameElements(ImageFixtures.syntheticPng(7L, 0)))
    assert(!ImageFixtures.syntheticPng(7L, 0).sameElements(ImageFixtures.syntheticPng(8L, 0)))
    assert(!ImageFixtures.syntheticPng(7L, 0).sameElements(ImageFixtures.syntheticPng(7L, 1)))
  }

  test("phash: copies identical, planted near-dups within Hamming 3, distinct seeds far") {
    val seeds = (0L until 200L).toSeq
    val hashes = seeds.map(s => ImageKernels.phash64(ImageFixtures.syntheticPng(s, 0)).longValue())
    // exact copy: same bytes, same hash (trivially) — and the DECODE is
    // deterministic across calls
    assert(ImageKernels.phash64(ImageFixtures.syntheticPng(5L, 0)) == hashes(5))
    // planted near-dup (new bytes, new dims): brightness moves only the
    // DC coefficient, the 2x upscale resamples back exactly — Hamming
    // stays inside the quarter-blocking recall guarantee (<= 3)
    seeds.foreach { s =>
      val nd = ImageKernels.phash64(ImageFixtures.syntheticPng(s, 1)).longValue()
      assert(hamming(hashes(s.toInt), nd) <= 3, s"seed $s")
    }
    // distinct planted sign patterns: ~Binomial(63, 1/2) apart (measured
    // min 16 over the 19,900 pairs); the floor 12 is 4x the dedup
    // threshold and trips on any real clustering regression
    val minH = (for {
      i <- seeds.indices; j <- seeds.indices if i < j
    } yield hamming(hashes(i), hashes(j))).min
    assert(minH > 12, s"min pairwise Hamming $minH")
  }

  test("dhash: copies identical, brightness-shifted near-dups close, distinct seeds far") {
    val seeds = (0L until 100L).toSeq
    val hashes = seeds.map(s => ImageKernels.dhash64(ImageFixtures.syntheticPng(s, 0)).longValue())
    val minH = (for {
      i <- seeds.indices; j <- seeds.indices if i < j
    } yield hamming(hashes(i), hashes(j))).min
    assert(minH > 10, s"min pairwise Hamming $minH")
    // gradient hash is exactly brightness-invariant; the 9x8 resample of
    // the 64x64 upscale uses different box boundaries, so near-dup
    // distance is small but not zero — pin a loose ceiling
    seeds.foreach { s =>
      val nd = ImageKernels.dhash64(ImageFixtures.syntheticPng(s, 1)).longValue()
      assert(hamming(hashes(s.toInt), nd) <= 12, s"seed $s")
    }
  }

  test("undecodable, empty, null and oversized payloads hash to null, never throw") {
    assert(ImageKernels.phash64(null) == null)
    assert(ImageKernels.phash64(Array.empty[Byte]) == null)
    assert(ImageKernels.phash64("not an image".getBytes("UTF-8")) == null)
    assert(ImageKernels.dhash64(Array[Byte](0x89.toByte, 'P', 'N', 'G')) == null)
    // a real PNG header claiming giant dims decodes to null via MaxPixels
    // (ImageIO itself may reject it first — either way: null, no throw)
    val bomb = ImageFixtures.syntheticPng(1L, 0).clone()
    // IHDR width bytes live at offset 16..19 — claim 2^30
    bomb(16) = 0x40; bomb(17) = 0; bomb(18) = 0; bomb(19) = 0
    assert(ImageKernels.phash64(bomb) == null)
  }

  test("expressions: SQL + Column API agree, null discipline through codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, ImageFixtures.syntheticPng(i % 10, 0)))
      .toDF("id", "img")
      .withColumn("img", when(col("id") === 19, lit(null)
        .cast("binary")).otherwise(col("img")))
    df.createOrReplaceTempView("imgs")
    val viaSql = spark.sql(
      "SELECT id, image_phash(img) p, image_dhash(img) d FROM imgs")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getLong(2)))).toMap
    assert(viaSql(19L) == null)
    assert(viaSql(3L) == viaSql(13L)) // same seed -> same hashes
    assert(viaSql(3L) != viaSql(4L))
    val viaCol = df.select(col("id"),
      GraftFunctions.imagePHash(col("img")).as("p")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(viaCol(3L) == viaSql(3L)._1)
    // fixture expression builds the same bytes executor-side
    val viaExpr = spark.range(5).select(
      GraftFunctions.imagePHash(
        GraftFunctions.syntheticPng(col("id"), lit(0))).as("p"))
      .collect().map(_.getLong(0))
    assert(viaExpr(3) == viaSql(3L)._1)
  }

  test("lumaHistogram: real decode features, L1-normalized, null for junk") {
    val f = ImageKernels.lumaHistogram(ImageFixtures.syntheticPng(2L, 0), 16)
    assert(f != null && f.length == 16)
    assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-5)
    // planted planes center on 128 +- 80: mass lives in the middle bins
    assert(f(0) == 0.0f && f(15) == 0.0f)
    assert(ImageKernels.lumaHistogram("junk".getBytes, 16) == null)
  }
}

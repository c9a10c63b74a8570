package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.ImageFixtures

class ImageDedupSpec extends AnyFunSuite with SparkTestBase {

  /** Planted corpus, the gate-query scheme: id%10==7 → byte-exact copy of
    * id-7; id%10==8 → perceptual near-dup of id-8 (new bytes/dims, tiny
    * pHash distance); everything else an original with its own seed. */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val (seed, variant) = (i % 10) match {
        case 7 => ((i - 7).toLong, 0)
        case 8 => ((i - 8).toLong, 1)
        case _ => (i.toLong, 0)
      }
      (i.toLong, ImageFixtures.syntheticPng(seed, variant))
    }.toDF("id", "img")
  }

  test("exactDupGroups: copies collapse onto their base, near-dups do not") {
    val groups = ImageDedup.exactDupGroups(corpus(40), "id", "img")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bases 0,10,20,30 each have one byte-exact copy (+7)
    Seq(0L, 10L, 20L, 30L).foreach(b => assert(groups(b) == 2, s"base $b"))
    // near-dups have different bytes -> singleton groups of their own id
    Seq(8L, 18L, 28L, 38L).foreach(d => assert(groups(d) == 1, s"neardup $d"))
    assert(!groups.contains(7L) && !groups.contains(17L))
  }

  test("dedupExactBinary keeps min id per payload; null payloads pass through") {
    val df = corpus(20).withColumn("img",
      when(col("id") === 19, lit(null).cast("binary")).otherwise(col("img")))
    val kept = ImageDedup.dedupExactBinary(df, "id", "img")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(7L) && !kept.contains(17L)) // copies dropped
    assert(kept.contains(0L) && kept.contains(10L))   // bases kept
    assert(kept.contains(8L) && kept.contains(18L))   // near-dups: new bytes
    assert(kept.contains(19L))                        // null payload survives
  }

  test("phashCandidatePairs finds exactly the planted perceptual pairs") {
    val pairs = ImageDedup.phashCandidatePairs(corpus(50), "id", "img")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (base, base+7) byte-copy and (base, base+8) near-dup pair is
    // within Hamming 3 of its base; copy and near-dup of the same base
    // also pair with each other
    (0 until 50 by 10).foreach { b =>
      assert(pairs.contains((b.toLong, b + 7L)), s"copy pair of $b")
      assert(pairs.contains((b.toLong, b + 8L)), s"neardup pair of $b")
      assert(pairs.contains((b + 7L, b + 8L)), s"copy-neardup pair of $b")
    }
    // nothing across distinct seeds
    assert(pairs.size == 15, s"extra pairs: ${pairs.size}")
  }

  test("dedupNearImages collapses each planted cluster to its base; undecodable rows survive") {
    import spark.implicits._
    val junk = Seq((100L, "not an image".getBytes)).toDF("id", "img")
    val kept = ImageDedup.dedupNearImages(corpus(30).unionByName(junk), "id", "img")
      .select("id").collect().map(_.getLong(0)).toSet
    (0 until 30 by 10).foreach { b =>
      assert(kept.contains(b.toLong))
      assert(!kept.contains(b + 7L) && !kept.contains(b + 8L))
    }
    assert(kept.contains(100L))
    assert(kept.size == 30 - 6 + 1)
  }

  test("quarter blocking guarantee: radius above 3 is refused loudly") {
    intercept[IllegalArgumentException] {
      ImageDedup.phashCandidatePairs(corpus(10), "id", "img", maxHamming = 4)
    }
  }
}

package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class StreamingDistinctSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def items(xs: String*) = xs.toDF("token")

  test("merged estimates honor the HLL bound under ANY batching; a fixed batching is fully deterministic") {
    // the same 600-token stream (with overlap) split two different ways
    val b1 = items((0 until 400).map(i => s"tok$i"): _*)
    val b2 = items((200 until 600).map(i => s"tok$i"): _*)
    val c1 = items(((0 until 150) ++ (300 until 600)).map(i => s"tok$i"): _*)
    val c2 = items(((100 until 400) ++ (200 until 300)).map(i => s"tok$i"): _*)

    val dirB = Files.createTempDirectory("graft-hll-b").toString
    val _ = StreamingDistinct.applyBatch(b1, dirB, added = 1L)
    val mB = StreamingDistinct.applyBatch(b2, dirB, added = 2L)
    val dirC = Files.createTempDirectory("graft-hll-c").toString
    val _2 = StreamingDistinct.applyBatch(c1, dirC, added = 1L)
    val mC = StreamingDistinct.applyBatch(c2, dirC, added = 2L)

    // overlap counts once: both batchings land within the HLL error
    // bound of the TRUE distinct count (600) — the accumulator counts
    // the set, not the sum of batch sizes (which would be 800)
    for (est <- Seq(mB.getEstimate, mC.getEstimate,
        StreamingDistinct.estimate(spark, dirB),
        StreamingDistinct.estimate(spark, dirC)))
      assert(math.abs(est - 600.0) / 600.0 < 0.05, s"estimate $est")

    // a FIXED batching is fully deterministic: re-running the same
    // sequence into a fresh store persists byte-identical state (class
    // doc: the bound is pinned, not a false cross-batching identity)
    val dirB2 = Files.createTempDirectory("graft-hll-b2").toString
    val _3 = StreamingDistinct.applyBatch(b1, dirB2, added = 1L)
    val _4 = StreamingDistinct.applyBatch(b2, dirB2, added = 2L)
    def bytes(dir: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "hll.bin"))
    assert(java.util.Arrays.equals(bytes(dirB), bytes(dirB2)))
  }

  test("replayed batch (added not above lastAdded) merges at most once; tag bookkeeping stays truthful") {
    val dir = Files.createTempDirectory("graft-hll-replay").toString
    val b = items("x", "y", "z")
    val _ = StreamingDistinct.applyBatch(b, dir, added = 5L)
    val after = StreamingDistinct.applyBatch(b, dir, added = 5L) // replay
    assert(math.abs(after.getEstimate - 3.0) < 0.01)
    val (meta, _) = StreamingDistinct.readAll(spark, dir).get
    assert(meta.lastAdded == 5L)
    val _2 = StreamingDistinct.applyBatch(items("w"), dir, added = 6L)
    assert(math.abs(StreamingDistinct.estimate(spark, dir) - 4.0) < 0.01)
  }

  test("lgK is meta-derived: later batches fold under the CREATED geometry") {
    val dir = Files.createTempDirectory("graft-hll-geom").toString
    val _ = StreamingDistinct.applyBatch(items("a"), dir, added = 1L, lgK = 10)
    val m = StreamingDistinct.applyBatch(items("b"), dir, added = 2L, lgK = 14)
    assert(m.getLgConfigK == 10)
    assert(StreamingDistinct.readAll(spark, dir).get._1.lgK == 10)
  }

  test("empty store reads None; an all-null batch merges nothing but advances the tag") {
    val dir = Files.createTempDirectory("graft-hll-empty").toString
    assert(StreamingDistinct.readAll(spark, dir).isEmpty)
    assert(StreamingDistinct.estimate(spark, dir) == 0.0)
    val m = StreamingDistinct.applyBatch(
      Seq(Option.empty[String]).toDF("token"), dir, added = 1L)
    assert(m.getEstimate == 0.0)
    assert(StreamingDistinct.readAll(spark, dir).get._1.lastAdded == 1L)
  }
}

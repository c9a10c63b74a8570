package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

class QuantizeSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))

  test("codes are tinyint, reconstruction error bounded by half a step") {
    val (lo, hi) = Quantize.dimStats(emb, "embedding")
    assert(lo.length == hi.length && lo.length > 0)
    assert(lo.indices.forall(i => lo(i) <= hi(i)))

    val coded = Quantize.quantize(emb, "embedding", lo, hi)
    assert(coded.schema("qcodes").dataType == ArrayType(ByteType, containsNull = true))

    val err = coded.select(
      max(aggregate(
        zip_with(
          Quantize.dequantize(col("qcodes"), lo, hi),
          col("embedding").cast(ArrayType(DoubleType)),
          (r, v) => abs(r - v)),
        lit(0.0), (acc, v) => greatest(acc, v))).as("max_abs_err"))
      .collect().head.getDouble(0)
    val maxStep = lo.indices.map(i => math.max(hi(i) - lo(i), 0.0) / 255.0).max
    assert(err <= maxStep / 2 + 1e-9, s"max err $err vs half-step ${maxStep / 2}")
  }

  test("quantized top-k recall vs exact float cosine is high") {
    val (lo, hi) = Quantize.dimStats(emb, "embedding")
    val coded = Quantize.quantize(emb, "embedding", lo, hi)
    val queries = coded.filter(col("vec_id") % 100 === 0)

    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val approx = Quantize.bruteForceTopKQuantized(coded, queries,
        "vec_id", "qcodes", lo, hi, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))

    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approxSets = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exactSets.map { case (q, want) =>
      approxSets.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9, s"mean recall@10 $meanRecall")
  }

  test("quantization is deterministic across partitionings") {
    val (lo, hi) = Quantize.dimStats(emb, "embedding")
    def codes(df: org.apache.spark.sql.DataFrame) =
      Quantize.quantize(df, "embedding", lo, hi)
        .select(col("vec_id"), col("qcodes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(codes(emb) == codes(emb.repartition(13)))
  }

  test("fused quantized cosine is bit-identical to the HOF pipeline") {
    val (lo, hi) = Quantize.dimStats(emb, "embedding")
    val coded = Quantize.quantize(emb, "embedding", lo, hi)
    // all pairs of a small slice, both formulations side by side; compare
    // raw bits, not approximate equality — the fused loop must replicate
    // the exact double ops of dequantize + cosine
    val a = coded.limit(20).select(col("qcodes").as("qa"))
    val b = coded.limit(20).select(col("qcodes").as("qb"))
    val both = a.crossJoin(b).select(
      Quantize.cosineQuantized(col("qa"), col("qb"), lo, hi).as("fused"),
      Quantize.cosineQuantizedHof(col("qa"), col("qb"), lo, hi).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // self-similarity sanity: fused cosine of a vector with itself ≈ 1
    val self = coded.limit(5).select(
      Quantize.cosineQuantized(col("qcodes"), col("qcodes"), lo, hi).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }
}

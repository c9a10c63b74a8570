package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

class PqSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))

  private lazy val dim =
    emb.select(size(col("embedding"))).first().getInt(0)

  test("codes are m bytes; codebook shapes line up") {
    val model = Pq.train(emb, "embedding", m = 8, k = 16)
    assert(model.dsub * model.m == dim)
    assert(model.cents.length == model.m * model.k * model.dsub)
    val coded = Pq.encode(emb, "embedding", model)
    assert(coded.schema("pq_codes").dataType ==
      ArrayType(ByteType, containsNull = false) ||
      coded.schema("pq_codes").dataType == ArrayType(ByteType, containsNull = true))
    val sizes = coded.select(size(col("pq_codes"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(model.m))
  }

  test("ADC discriminates: self-score beats cross-score and stays <= 1") {
    // A vector's ADC score against ITS OWN lut ≈ q · q̂ (the PQ
    // reconstruction) — lossy, so well below 1 on near-random data, but it
    // must clearly separate from the score against OTHER vectors' luts
    // (≈ 0 for near-orthogonal embeddings) or ADC ranking carries no
    // signal.
    val model = Pq.train(emb, "embedding", m = 16, k = 16)
    val shim = org.apache.spark.sql.GraftColumnShim
    def lutOf(vecCol: String) = shim.column(graft.functions.PqLut(
      shim.expression(Pq.normalized(col(vecCol))),
      model.cents, model.m, model.k, model.dsub))
    def adcOf(lut: org.apache.spark.sql.Column) =
      shim.column(graft.functions.PqAdc(
        shim.expression(col("pq_codes")), shim.expression(lut), model.k))
    val coded = Pq.encode(emb, "embedding", model)
    val self = coded.withColumn("adc", adcOf(lutOf("embedding")))
      .agg(avg(col("adc"))).head.getDouble(0)
    // cross: score each code against the lut of a DIFFERENT row (shift ids)
    val n = emb.count()
    val shifted = emb.select(((col("vec_id") + 1) % n).as("vec_id"),
      col("embedding").as("other"))
    val cross = coded.join(shifted, "vec_id")
      .withColumn("adc", adcOf(lutOf("other")))
      .agg(avg(col("adc"))).head.getDouble(0)
    assert(self <= 1.05, s"mean self-ADC $self")
    assert(self > cross + 0.2, s"self $self vs cross $cross — no discrimination")
  }

  test("PQ + exact re-rank recall vs float brute force") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val model = Pq.train(emb, "embedding", m = 8, k = 16)
    val approx = Pq.topK(emb, queries, "vec_id", "embedding", model,
        k = 10, rerank = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approxSets = approx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exactSets.map { case (q, want) =>
      approxSets.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.6, s"mean recall@10 with rerank=50: $meanRecall")
  }

  test("training and encoding are deterministic across partitionings") {
    val m1 = Pq.train(emb.repartition(1), "embedding", m = 8, k = 16)
    val m7 = Pq.train(emb.repartition(7), "embedding", m = 8, k = 16)
    // sample() is partitioning-dependent in general, but sf0.001 is below
    // targetRows so both train on the full corpus — centroids must agree
    assert(m1.cents.sameElements(m7.cents))
    def codes(df: org.apache.spark.sql.DataFrame) =
      Pq.encode(df, "embedding", m1).select(col("vec_id"), col("pq_codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(codes(emb.repartition(3)) == codes(emb.repartition(11)))
  }
}

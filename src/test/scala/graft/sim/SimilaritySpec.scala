package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = graft.sources.Tables
    .read(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("cosine: unit vectors, orthogonal, zero-norm") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), -1.0),
      (Seq(0.0f, 0.0f), Seq(1.0f, 0.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "want")
    df.select(Similarity.cosine(col("a"), col("b")).as("got"), col("want"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k: self-consistent, k rows per query, rank ordered") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val top = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect()
    val byQuery = top.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (_, rows) =>
      assert(rows.length == 5)
      val cosines = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cosines.sameElements(cosines.sortBy(-(_: Double))), "rank follows cosine desc")
    }
  }

  test("lsh top-k recall vs brute force") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5,
      planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 4 planes + multi-probe scans ~5/16 of the corpus; random 64-dim
    // gaussians have weak neighbors, so recall is modest by construction
    assert(recall > 0.3, s"LSH recall too low: $recall")
  }

  test("ivf top-k with label as coarse list scans only own partition") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val got = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", "label", k = 3)
      .collect()
    assert(got.nonEmpty)
    // every neighbor shares the query's label (by construction of IVF lists)
    val labels = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    got.foreach(r => assert(labels(r.getLong(0)) == labels(r.getLong(1))))
  }

  test("trained IVF: k-means lists partition the corpus; multi-probe recall beats 1-probe") {
    val centroids = Similarity.ivfTrain(emb, "embedding", nLists = 8)
    assert(centroids.length == 8 && centroids.head.length == 64)

    val listed = Similarity.withIvfList(emb, "embedding", centroids)
    val counts = listed.groupBy("__list").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf((0 until 8).toSet) && counts.size >= 4)
    assert(counts.values.sum == emb.count())

    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbe: Int): Double = {
      val approx = Similarity.ivfTopKTrained(emb, queries, "vec_id", "embedding",
        5, centroids, nProbe).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"multi-probe recall $r4 < single-probe $r1")
    assert(r4 > 0.4, s"4-probe recall too low: $r4")
  }

  test("k-means topic clustering: exhaustive assignment, duplicates co-cluster") {
    val centroids = Similarity.ivfTrain(emb, "embedding", nLists = 8)
    // planted exact duplicates under shifted ids (the kmeans_topics shape)
    val planted = emb.select(col("vec_id"), col("embedding")).unionByName(
      emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val assigned = Similarity.withIvfList(planted, "embedding", centroids, "cluster")
    val report = assigned.groupBy("cluster")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_members"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every vector lands in exactly one of the k clusters
    assert(report.keySet.subsetOf((0 until 8).toSet))
    assert(report.values.sum == planted.count())
    // identical vectors get identical cluster ids (assignment is a pure
    // function of the embedding)
    val byId = assigned.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    byId.keys.filter(_ >= 1000000L).foreach { dup =>
      assert(byId(dup) == byId(dup - 1000000L))
    }
  }

  test("fused dot/cosine are bit-identical to the HOF formulations, incl. mixed float/double sides") {
    import org.apache.spark.sql.functions._
    val pairs = emb.limit(30).select(col("embedding").as("a"))
      .crossJoin(emb.limit(30).select(col("embedding").as("b")))
    val both = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("fc"),
      Similarity.cosineHof(col("a"), col("b")).as("hc"),
      Similarity.dot(col("a"), col("b")).as("fd"),
      Similarity.dotHof(col("a"), col("b")).as("hd"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    // mixed sides: float column vs double literal array (the centroid /
    // hyperplane scoring shape inside withIvfList and bucketing)
    val centroid = array((0 until 64).map(i => lit(0.01 * i)): _*)
    val mixed = emb.limit(50).select(
      Similarity.dot(col("embedding"), centroid).as("fd"),
      Similarity.dotHof(col("embedding"), centroid).as("hd")).collect()
    mixed.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("hyperplane bucketing is deterministic and splits the corpus") {
    val b1 = Similarity.withHyperplaneBucket(emb, "embedding", 8, 42L)
      .select("vec_id", "__bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.withHyperplaneBucket(emb, "embedding", 8, 42L)
      .select("vec_id", "__bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 10) // 256 possible buckets, 500 vecs
  }
}

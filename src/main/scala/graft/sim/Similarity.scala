package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), in two tiers:
  *
  *  - brute-force cosine top-k: broadcast the (small) query set, one scan
  *    of the corpus, per-query top-k via window. Exact baseline; scales
  *    linearly in corpus size — the right shape when queries are few.
  *  - bucketed ANN: random-hyperplane LSH (sign-bit bucket per doc, one
  *    scan) or IVF-style partition by a coarse centroid id; the probe
  *    searches only matching buckets. Trades recall for a corpus-shard
  *    scan — the 100 TB path.
  *
  * Dot products run through `zip_with` + `aggregate` (codegen'd HOFs) in
  * double precision with left-to-right accumulation — deterministic, so
  * results are reproducible across partitionings.
  */
object Similarity {

  /** Deterministic double-precision dot product of two float-array cols. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * The query side is broadcast (it must be small — that is the contract
    * of a top-k probe); the corpus is scanned once, no corpus shuffle
    * until the final per-query window on (queries × k) rows. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Fixed pseudo-random hyperplanes: deterministic per (seed, plane, dim)
    * via splitmix64 → uniform in [-1, 1). Generated as literal arrays on
    * the driver — tiny (planes × dim doubles) and embedded in the plan. */
  private[graft] def hyperplanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    def splitmix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(planes, dim) { (p, d) =>
      val h = splitmix(seed * 1000003L + p * 8191L + d)
      // top 53 bits → [0,1) → [-1,1)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Sign-bit LSH bucket id from `planes` random hyperplanes: one scan,
    * no shuffle; bucket = integer of sign bits. E[docs/bucket] =
    * n / 2^planes — pick planes ≈ log2(n / targetBucketSize). */
  def withHyperplaneBucket(
      df: DataFrame, vecCol: String, planes: Int, seed: Long): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val hp = hyperplanes(planes, dim, seed)
    val bits = hp.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(col(vecCol), planeCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("__bucket", bits.reduce(_ + _))
  }

  /** ANN top-k via hyperplane buckets with multi-probe: each query probes
    * its own bucket plus all buckets at Hamming distance 1 (planes + 1
    * probes), then exact cosine ranks within the probed set. Recall is
    * tunable via `planes` (fewer planes → bigger buckets → higher recall,
    * more compute). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, seed: Long = 42L): DataFrame = {
    val c = withHyperplaneBucket(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      "__cv", planes, seed)
    val q0 = withHyperplaneBucket(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
      "__qv", planes, seed)
    // multi-probe: own bucket + flip each bit once
    val probes = q0.withColumn("__probe",
      explode(array((col("__bucket") +:
        (0 until planes).map(p => col("__bucket").bitwiseXOR(lit(1L << p)))): _*)))
      .drop("__bucket")

    val scored = c.join(broadcast(probes), col("__bucket") === col("__probe"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Train an IVF coarse quantizer: k-means (MLlib) over a sample of the
    * corpus; returns the centroid matrix. At 100 TB the sample fraction
    * keeps training driver-bounded while the assignment below stays a
    * pure scan. */
  /** [[ivfTrain]] with the sample fraction derived from the corpus size:
    * k-means sees at most `targetRows` vectors, so training cost is flat
    * no matter how large the corpus grows (full-corpus training at 100 TB
    * would be 10 full scans for the default 10 iterations). Small corpora
    * (≤ targetRows) still train on everything. */
  def ivfTrainAuto(
      corpus: DataFrame, vecCol: String, nLists: Int,
      targetRows: Long = 50000L, seed: Long = 42L): Array[Array[Double]] = {
    val n = corpus.count()
    val frac = if (n <= targetRows) 1.0 else targetRows.toDouble / n
    ivfTrain(corpus, vecCol, nLists, frac, seed)
  }

  def ivfTrain(
      corpus: DataFrame, vecCol: String, nLists: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled =
      (if (sampleFraction >= 1.0) corpus else corpus.sample(sampleFraction, seed))
        .select(array_to_vector(col(vecCol).cast(ArrayType(DoubleType))).as("features"))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(10)
      .fit(sampled)
    model.clusterCenters.map(_.toArray)
  }

  /** Assign each row its IVF list id = argmin distance to a centroid.
    * Centroids are embedded as literals (tiny: nLists × dim doubles), so
    * assignment is a pure scan — no shuffle, no model object on
    * executors. Squared L2 via the dot-product identity keeps it one
    * `aggregate` per centroid. */
  def withIvfList(
      df: DataFrame, vecCol: String, centroids: Array[Array[Double]],
      listCol: String = "__list"): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit): _*)
      val negHalfCC = -0.5 * c.map(x => x * x).sum
      // argmin ||v - c||^2 == argmax (v·c - 0.5·c·c); v·v is constant per row
      struct((dot(col(vecCol), cCol) + negHalfCC).as("score"), lit(i).as("list"))
    }
    df.withColumn(listCol, array_max(array(scored: _*)).getField("list"))
  }

  /** IVF ANN top-k with multi-probe: queries search their own list plus
    * the `nProbe - 1` next-nearest lists, exact cosine ranks within the
    * probed set. At 100 TB the corpus is written partitioned by the list
    * id, so each probe is a file-pruned shard scan. */
  def ivfTopKTrained(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nProbe: Int = 2): DataFrame = {
    val c = withIvfList(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      "__cv", centroids)
    // queries probe their nProbe nearest centroids
    val scored = centroids.zipWithIndex.map { case (cen, i) =>
      val cCol = array(cen.map(lit): _*)
      val negHalfCC = -0.5 * cen.map(x => x * x).sum
      struct((dot(col("__qv"), cCol) + negHalfCC).as("score"), lit(i).as("list"))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__probe", explode(slice(reverse(array_sort(array(scored: _*))), 1, nProbe)
        .getField("list")))
    val joined = c.join(broadcast(q), col("__list") === col("__probe"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** IVF-style top-k using a precomputed coarse-partition column (e.g. a
    * cluster/centroid id): queries only scan their own partition. The
    * partition column plays the inverted-file list id; at 100 TB the
    * corpus would be written bucketed/partitioned by it so the probe scan
    * prunes at the file level. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, listCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(listCol).as("__list"),
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(listCol).as("__list"),
      col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.join(broadcast(q), Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}

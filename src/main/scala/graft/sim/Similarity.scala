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

  private def shimCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftColumnShim.column(e)
  private def shimExpr(c: Column) =
    org.apache.spark.sql.GraftColumnShim.expression(c)

  /** Deterministic double-precision dot product of two float-or-double
    * array columns: ONE fused codegen'd loop
    * ([[graft.functions.VecDot]]), bit-identical to [[dotHof]] (pinned in
    * SimilaritySpec) with zero per-row array allocations. */
  def dot(a: Column, b: Column): Column =
    shimCol(graft.functions.VecDot(shimExpr(a), shimExpr(b)))

  /** The compositional higher-order-function dot — kept as the executable
    * specification [[dot]] is pinned against. */
  private[sim] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity; 0.0 when either vector has zero norm. Fused
    * single-loop expression ([[graft.functions.VecCosine]]), bit-identical
    * to [[cosineHof]] — per-element double ops and left-to-right
    * accumulation are the same, so the ORACLED cosine queries stay
    * hash-exact. The fusion matters because every ANN/semantic-dedup path
    * scores candidate pairs with this: the HOF formulation allocated ~5
    * intermediate arrays per scored pair. */
  def cosine(a: Column, b: Column): Column =
    shimCol(graft.functions.VecCosine(shimExpr(a), shimExpr(b)))

  /** The compositional higher-order-function cosine — kept as the
    * executable specification [[cosine]] is pinned against. */
  private[sim] def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
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

  /** [[ivfTrain]] on a bounded read: training sees at most `targetRows`
    * vectors, so its cost is flat no matter how large the corpus grows
    * (full-corpus distributed k-means at 100 TB would be 10 full scans
    * for 10 iterations). Small corpora (≤ targetRows) still train on
    * everything.
    *
    * NO pre-count (same fix as [[Pq.train]]): deriving the sample
    * fraction from `corpus.count()` costs one gratuitous full corpus
    * pass at 100 TB — the ONLY action here is the bounded limit-collect.
    * The trade (same bias caveat as Pq.train): on a corpus larger than
    * `targetRows` the default path trains on whatever partitions Spark
    * scans first, which is biased when the data is sorted/clustered by
    * source. Callers that know the corpus size (catalog stats) pass
    * `rowCount` to restore the uniform seeded sample. */
  def ivfTrainAuto(
      corpus: DataFrame, vecCol: String, nLists: Int,
      targetRows: Long = 50000L, seed: Long = 42L,
      rowCount: Option[Long] = None): Array[Array[Double]] =
    rowCount match {
      case Some(n) if n > targetRows =>
        ivfTrain(corpus, vecCol, nLists, targetRows.toDouble / n, seed)
      case _ =>
        ivfTrain(corpus.limit(math.min(targetRows, MaxTrainRows.toLong).toInt),
          vecCol, nLists, 1.0, seed)
    }

  /** Train the IVF coarse quantizer: ONE distributed pass collects the
    * bounded sample (≤ targetRows vectors — the quantizer is sample-
    * trained by design, like every IVF implementation), then Lloyd's
    * k-means runs ON THE DRIVER in plain arrays. A 50k × 64-dim sample is
    * ~25 MB; iterating locally avoids 20+ tiny cluster jobs whose
    * scheduling overhead dominates k-means at any scale. Deterministic
    * under a fixed seed. The per-row list ASSIGNMENT ([[withIvfList]])
    * stays a distributed pure scan. */
  /** Hard ceiling on driver-collected training vectors — even a caller
    * passing sampleFraction = 1.0 on a huge corpus stays driver-safe
    * (200k × 64-dim ≈ 100 MB). */
  final val MaxTrainRows = 200000

  def ivfTrain(
      corpus: DataFrame, vecCol: String, nLists: Int,
      sampleFraction: Double = 1.0, seed: Long = 42L): Array[Array[Double]] = {
    val sample: Array[Array[Double]] =
      (if (sampleFraction >= 1.0) corpus else corpus.sample(sampleFraction, seed))
        .select(col(vecCol).cast(ArrayType(DoubleType)))
        .limit(MaxTrainRows)
        .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    lloyd(sample, nLists, iters = 10, seed)
  }

  /** Plain Lloyd's algorithm, deterministic: seeded shuffle init, L2
    * assignment, mean update, empty clusters reseeded to the point
    * farthest from its centroid. */
  private[sim] def lloyd(
      points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val dim = points(0).length
    val centroids = rnd.shuffle(points.indices.toVector).take(math.min(k, n))
      .map(points(_).clone).toArray ++
      Array.tabulate(math.max(0, k - n))(i => points(i % n).map(_ + 1e-9 * (i + 1)))
    val assign = new Array[Int](n)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    for (_ <- 0 until iters) {
      var p = 0
      while (p < n) { // assignment
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val dd = d2(points(p), centroids(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        assign(p) = best; p += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      p = 0
      while (p < n) { // update
        val c = assign(p); counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += points(p)(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        } else { // empty cluster: reseed to the worst-fit point
          var worst = 0; var worstD = -1.0; var q = 0
          while (q < n) {
            val dd = d2(points(q), centroids(assign(q)))
            if (dd > worstD) { worstD = dd; worst = q }
            q += 1
          }
          centroids(c) = points(worst).clone
        }
        c += 1
      }
    }
    centroids
  }

  /** Assign each row its IVF list id = argmin distance to a centroid.
    * Centroids are embedded as literals (tiny: nLists × dim doubles), so
    * assignment is a pure scan — no shuffle, no model object on
    * executors. Squared L2 via the dot-product identity keeps it one
    * `aggregate` per centroid. */
  /** Per-centroid `(score, list)` structs for a vector column, scored by
    * the dot identity: argmin ‖v−c‖² == argmax (v·c − 0.5·c·c) since v·v
    * is constant per row. The ONE implementation every coarse-quantizer
    * consumer shares — single-list assignment ([[withIvfList]]), query
    * probing ([[ivfTopKTrained]], [[IvfIndex.topK]]) — so tie-breaking
    * and the score identity cannot drift between the in-memory and
    * persistent paths. */
  private[sim] def centroidScores(
      vec: Column, centroids: Array[Array[Double]]): Seq[Column] =
    centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit): _*)
      val negHalfCC = -0.5 * c.map(x => x * x).sum
      struct((dot(vec, cCol) + negHalfCC).as("score"), lit(i).as("list"))
    }

  /** The `nProbe` nearest list ids for a vector column, as an exploded
    * column (ties break toward the larger list id, matching the
    * assignment argmax). */
  private[sim] def probeListsCol(
      vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    explode(slice(reverse(array_sort(array(centroidScores(vec, centroids): _*))),
      1, nProbe).getField("list"))

  def withIvfList(
      df: DataFrame, vecCol: String, centroids: Array[Array[Double]],
      listCol: String = "__list"): DataFrame =
    df.withColumn(listCol,
      array_max(array(centroidScores(col(vecCol), centroids): _*))
        .getField("list"))

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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__probe", probeListsCol(col("__qv"), centroids, nProbe))
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

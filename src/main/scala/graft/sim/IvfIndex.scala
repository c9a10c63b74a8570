package graft.sim

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A PERSISTENT IVF (inverted-file) ANN index — the similarity-search
  * twin of the dedup catalogs ([[graft.dedup.BandedCatalog]]): build the
  * index once, query it many times with file-pruned probe scans, grow it
  * incrementally without retraining.
  *
  * The in-memory path ([[Similarity.ivfTopKTrained]]) re-trains and
  * re-assigns the corpus on every call — right for one-shot queries,
  * wrong for a 100 TB embedding store serving many query batches. This
  * layout amortizes both:
  *
  *  - `dir/_graft_ivf.json` — meta (nLists, dim), the build's COMMIT
  *    MARKER (written LAST — see [[build]]); asserted on every open, so
  *    a crashed build fails every reader loudly instead of serving a
  *    partial corpus.
  *  - `dir/centroids/` — the trained coarse quantizer, `(list, centroid)`
  *    parquet (nLists × dim doubles — driver-small by construction).
  *  - `dir/vectors/` — `(id, vec)` parquet PARTITIONED BY `list`: a
  *    probe reads only the `list=…` directories its queries hash into
  *    (partition pruning, census-visible in the scan), so query cost is
  *    O(probed lists' occupancy), never O(corpus).
  *
  * At 100 TB: `nLists` scales with corpus size (√n is the usual rule) so
  * single lists stay file-sized; the build is one shuffle on the list id;
  * probes broadcast the (small) query side against the pruned shard scan.
  */
object IvfIndex {

  private val VecSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(DoubleType), nullable = true),
    StructField("list", IntegerType, nullable = false)))

  // ------------------------------------------------------------- meta

  /** nLists and dim are part of the layout: different values silently
    * mis-probe (wrong centroid count) or mis-score (wrong dim). */
  case class Meta(nLists: Int, dim: Int)

  private def metaPath(dir: String) = new Path(dir, "_graft_ivf.json")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    val out = fs(spark, dir).create(metaPath(dir), true)
    try out.write(s"""{"nLists":${m.nLists},"dim":${m.dim}}"""
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readMeta(spark: SparkSession, dir: String): Option[Meta] = {
    val p = metaPath(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def field(name: String): Int =
        s""""$name":(\\d+)""".r.findFirstMatchIn(text)
          .map(_.group(1).toInt)
          .getOrElse(throw new IllegalStateException(
            s"IVF index meta at $p is missing '$name': $text"))
      Some(Meta(field("nLists"), field("dim")))
    }
  }

  private def requireMeta(spark: SparkSession, dir: String): Meta =
    readMeta(spark, dir).getOrElse(throw new IllegalStateException(
      s"no IVF index at $dir (missing ${metaPath(dir)} — never built, or " +
        "a crashed build left no commit marker); build() it first"))

  /** Per-row dimension guard fused into the write/probe scan: a
    * mismatched vector would otherwise score NULL against every centroid
    * (VecDot's length contract), silently landing in the last list and
    * never surfacing as a neighbor. The guard wraps the vector column
    * itself so projection pruning can never skip it. Nulls pass (a null
    * embedding row stays a null-scored row, as in the in-memory path). */
  private def dimGuarded(vec: Column, dim: Int, what: String): Column =
    when(vec.isNotNull && size(vec) =!= dim,
      raise_error(concat(lit(s"$what expects dim $dim, got dim "),
        size(vec).cast("string")))).otherwise(vec)

  // ------------------------------------------------------------ build

  /** Train the coarse quantizer on a bounded sample and write the full
    * index. One distributed pass for the sample, one for the assignment
    * + partitioned write (single shuffle on the list id).
    *
    * The meta file is the build's COMMIT MARKER, written LAST — the
    * opposite order from the accreting catalogs (whose meta must land
    * before any of many independent appends). A build is ONE atomic
    * construction: a crash mid-build leaves data without meta, every
    * reader refuses it loudly ([[requireMeta]]), and re-running build()
    * clears the incomplete remnants and completes. No window exists
    * where a half-built index silently serves a subset of the corpus. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nLists: Int, targetRows: Long = 50000L, seed: Long = 42L,
      rowCount: Option[Long] = None): Unit = {
    val spark = corpus.sparkSession
    // refusal BEFORE the (expensive) quantizer training
    require(readMeta(spark, dir).isEmpty,
      s"IVF index at $dir already exists; build() into a fresh dir " +
        "(append new vectors with appendVectors())")
    val f = fs(spark, dir)
    if (f.exists(new Path(dir))) {
      // only ever clear CRASHED-BUILD remnants: refuse to delete a dir
      // holding anything but index-shaped entries (a caller pointing
      // build() at the wrong path must not lose data)
      val entries = f.listStatus(new Path(dir)).map(_.getPath.getName).toSet
      val indexShaped = Set("centroids", "vectors", "_compacting")
      require(entries.subsetOf(indexShaped),
        s"refusing to build over $dir: it contains non-index entries " +
          s"${(entries -- indexShaped).toSeq.sorted.mkString(", ")}")
      f.delete(new Path(dir), true)
    }
    val centroids = Similarity.ivfTrainAuto(
      corpus, vecCol, nLists, targetRows, seed, rowCount)
    val dim = centroids.head.length
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    writeVectors(corpus, idCol, vecCol, dir, centroids, dim)
    writeMeta(spark, dir, Meta(nLists, dim)) // commit
  }

  /** Assign NEW vectors to the EXISTING centroids and append them — the
    * incremental-growth path (an IVF's recall degrades gracefully as the
    * corpus drifts from the trained quantizer; rebuild when it does).
    * A crash mid-append leaves a PARTIAL batch; the replay contract is
    * the caller's (a streaming foreachBatch re-runs the batch), and the
    * resulting duplicate rows are collapsed by [[topK]] and [[compact]].
    */
  def appendVectors(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = corpus.sparkSession
    val m = requireMeta(spark, dir)
    writeVectors(corpus, idCol, vecCol, dir, readCentroids(spark, dir), m.dim)
  }

  private def writeVectors(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      centroids: Array[Array[Double]], dim: Int): Unit =
    Similarity.withIvfList(
      corpus.select(col(idCol).cast(LongType).as("id"),
        dimGuarded(col(vecCol).cast(ArrayType(DoubleType)), dim,
          s"IVF index at $dir").as("vec")),
      "vec", centroids, listCol = "list")
      .repartition(col("list"))
      // list prefix: satisfies the partitioned writer's required ordering
      // so it inserts no extra Sort; id order gives row-group min/max
      // stats for id-predicate scans (same reasoning as the catalogs)
      .sortWithinPartitions("list", "id")
      .write.mode("append").partitionBy("list").parquet(s"$dir/vectors")

  // ------------------------------------------------------------- read

  /** The trained centroids, ordered by list id (driver-small:
    * nLists × dim doubles). Count and dimensions are validated against
    * the meta on every read. */
  def readCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val m = requireMeta(spark, dir)
    val rows = spark.read.parquet(s"$dir/centroids")
      .select(col("list"), col("centroid"))
      .collect()
    require(rows.length == m.nLists,
      s"IVF index at $dir: ${rows.length} centroids, meta says ${m.nLists}")
    val cs = rows.sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    require(cs.forall(_.length == m.dim),
      s"IVF index at $dir: centroid dims ${cs.map(_.length).distinct.toSeq} " +
        s"do not all match meta dim ${m.dim}")
    cs
  }

  /** All indexed vectors (probe-free full scan — parity tests and
    * rebuilds; queries should use [[topK]]). */
  def vectors(spark: SparkSession, dir: String): DataFrame = {
    requireMeta(spark, dir)
    spark.read.schema(VecSchema).parquet(s"$dir/vectors")
  }

  // ------------------------------------------------------- compaction

  private def dataFiles(f: FileSystem, dir: String): Seq[Path] = {
    def walk(p: Path): Seq[Path] = {
      val entries = f.listStatus(p).toSeq
      entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath) ++
        entries.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
          .flatMap(s => walk(s.getPath))
    }
    val root = new Path(s"$dir/vectors")
    if (f.exists(root)) walk(root) else Seq.empty
  }

  /** Parquet data files per list — the per-list compaction trigger. A
    * streaming ingest appends up to one file per touched list per
    * micro-batch; like the dedup catalogs, the steady-state floor is one
    * file per list, so compaction decisions at scale must be per list
    * (LSM-style), never a whole-index rewrite per trigger-window. */
  def listFileCounts(spark: SparkSession, dir: String): Map[Int, Int] =
    dataFiles(fs(spark, dir), dir)
      .flatMap { p =>
        val parent = p.getParent.getName
        if (parent.startsWith("list=")) Some(parent.stripPrefix("list=").toInt)
        else None
      }
      .groupBy(identity).map { case (l, fs0) => (l, fs0.size) }

  /** Rewrite the selected lists (all of them when `lists = None`) as one
    * id-sorted file each, collapsing duplicate ids from replayed appends
    * to one row. Same duplicate-tolerant swap as the catalogs: merged
    * files MOVE IN before the inputs are deleted, so a crash anywhere
    * leaves (at worst) duplicate vectors — and [[topK]]'s ranking is
    * duplicate-stable (same id ⇒ same cosine ⇒ ties break on id), so
    * readers tolerate the window. */
  def compact(
      spark: SparkSession, dir: String,
      lists: Option[Seq[Int]] = None): Unit = {
    val f = fs(spark, dir)
    if (readMeta(spark, dir).isEmpty) return
    val inScope: Path => Boolean = lists match {
      case None => _ => true
      case Some(ls) =>
        val names = ls.map(l => s"list=$l").toSet
        p => names.contains(p.getParent.getName)
    }
    val oldFiles = dataFiles(f, dir).filter(inScope)
    if (oldFiles.isEmpty) return
    val vecDir = s"$dir/vectors"
    val scoped = lists match {
      case Some(ls) => spark.read.schema(VecSchema).parquet(vecDir)
        .filter(col("list").isin(ls: _*))
      case None => spark.read.schema(VecSchema).parquet(vecDir)
    }
    val tmp = s"$dir/_compacting"
    f.delete(new Path(tmp), true)
    scoped
      .groupBy(col("list"), col("id")).agg(first(col("vec")).as("vec"))
      .select(col("id"), col("vec"), col("list"))
      .repartition(col("list"))
      .sortWithinPartitions("list", "id") // list prefix: see writeVectors
      .write.mode("overwrite").partitionBy("list").parquet(tmp)
    for (listDir <- f.listStatus(new Path(tmp)).toSeq
         if listDir.isDirectory && listDir.getPath.getName.startsWith("list=")) {
      val target = new Path(vecDir, listDir.getPath.getName)
      f.mkdirs(target)
      for (part <- f.listStatus(listDir.getPath).toSeq
           if part.isFile && part.getPath.getName.endsWith(".parquet")) {
        val dest = new Path(target, s"compacted-${part.getPath.getName}")
        if (!f.rename(part.getPath, dest)) throw new java.io.IOException(
          s"IVF compaction: rename ${part.getPath} -> $dest failed; " +
            "old files left in place (duplicates only, no loss)")
      }
    }
    oldFiles.foreach(p => f.delete(p, false))
    f.delete(new Path(tmp), true)
  }

  /** ANN top-k against the persistent index with multi-probe: each query
    * searches its `nProbe` nearest lists; the vector scan carries a
    * `list IN (…)` PARTITION FILTER (≤ nLists distinct values, collected
    * from the query side — bounded), so only probed `list=…` directories
    * are read. Output schema matches [[Similarity.ivfTopKTrained]]. */
  def topK(
      spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val m = requireMeta(spark, dir)
    val centroids = readCentroids(spark, dir)
    // pinned (small, by the top-k probe contract): the probed-list
    // collect below and the join both consume the scored query frame —
    // without the pin the query source is scanned and centroid-scored
    // twice per call
    val q = graft.ops.Checkpoints.pin(queries
      .select(col(idCol).cast(LongType).as("query_id"),
        dimGuarded(col(vecCol).cast(ArrayType(DoubleType)), m.dim,
          s"IVF probe against $dir").as("__qv"))
      .withColumn("list",
        Similarity.probeListsCol(col("__qv"), centroids, nProbe)))
    // static partition filter from the probed lists: ≤ nLists distinct
    // values by construction, one bounded collect from the (small) query
    // side — the scan then prunes at the directory level
    val probed = q.select(col("list")).distinct().collect().map(_.getInt(0))
    val pruned = vectors(spark, dir).filter(col("list").isin(probed.toSeq: _*))
    val joined = pruned.join(broadcast(q), Seq("list"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("vec")))
      // collapse duplicate ids BEFORE ranking: a replayed append (the
      // crash window compact() tolerates) must not seat the same
      // neighbor twice in a top-k; same id ⇒ same vector ⇒ max is the
      // unchanged cosine, so the duplicate-free case is unaffected (a
      // vector lives in exactly one list, so probing never duplicates)
      .groupBy(col("query_id"), col("id"))
      .agg(max(col("cosine")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}

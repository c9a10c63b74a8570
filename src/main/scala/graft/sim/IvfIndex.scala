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

  private val CodeSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    // PqEncode's output shape (array<tinyint>): stored as-is so the ADC
    // scan feeds PqAdc without a conversion in the hot path
    StructField("pq_codes", ArrayType(ByteType), nullable = true),
    StructField("list", IntegerType, nullable = false)))

  // ------------------------------------------------------------- meta

  /** nLists and dim are part of the layout: different values silently
    * mis-probe (wrong centroid count) or mis-score (wrong dim).
    * `buildErrE6` is the build-time quantization-error reference (mean
    * squared assignment distance of the training-discipline sample,
    * ×1e6 as a long so the int-field meta format carries it) — the
    * denominator of [[driftRatio]]; absent on pre-drift-signal indexes,
    * which simply report no drift estimate. `expectPq` declares at
    * build time that a PQ leg is part of this index's contract
    * ([[retrain]] of a PQ-carrying index sets it): the IVF meta alone
    * then does NOT mark the index serving-complete — see [[committed]]. */
  case class Meta(nLists: Int, dim: Int, buildErrE6: Option[Long] = None,
      expectPq: Boolean = false)

  private def metaPath(dir: String) = new Path(dir, "_graft_ivf.json")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    val out = fs(spark, dir).create(metaPath(dir), true)
    val err = m.buildErrE6.fold("")(e => s""","buildErrE6":$e""")
    val pq = if (m.expectPq) ""","expectPq":1""" else ""
    try out.write(s"""{"nLists":${m.nLists},"dim":${m.dim}$err$pq}"""
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
      def fieldOpt(name: String): Option[Long] =
        s""""$name":(\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong)
      def field(name: String): Int =
        fieldOpt(name).map(_.toInt)
          .getOrElse(throw new IllegalStateException(
            s"IVF index meta at $p is missing '$name': $text"))
      Some(Meta(field("nLists"), field("dim"), fieldOpt("buildErrE6"),
        fieldOpt("expectPq").contains(1L)))
    }
  }

  private def requireMeta(spark: SparkSession, dir: String): Meta =
    readMeta(spark, dir).getOrElse(throw new IllegalStateException(
      s"no IVF index at $dir (missing ${metaPath(dir)} — never built, or " +
        "a crashed build left no commit marker); build() it first"))

  /** SERVING-COMPLETE probe for versioned lifecycles: the IVF meta has
    * landed AND every leg the meta declares has its own commit marker.
    * [[retrain]] of a PQ-carrying index writes the IVF meta with
    * `expectPq` (it must — [[buildPq]] reads that meta), so a crash in
    * the window between the raw build and the PQ commit leaves the new
    * version visibly incomplete and [[maintainVersioned]]'s resolution
    * keeps serving the predecessor instead of retiring it. */
  def committed(spark: SparkSession, dir: String): Boolean =
    readMeta(spark, dir).exists(m =>
      !m.expectPq || readPqMeta(spark, dir).isDefined)

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
      rowCount: Option[Long] = None, expectPq: Boolean = false): Unit = {
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
      val indexShaped = Set("centroids", "vectors", "_compacting",
        "codes", "pq_model", "_graft_ivf_pq.json")
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
    // build-time quantization-error reference for the drift signal,
    // measured over the SAME bounded training-discipline sample (limit:
    // partition-order, like the quantizer's own sample — the point is a
    // consistent reference statistic, not an unbiased census)
    val buildErr = assignError(
      corpus.limit(math.min(targetRows, Similarity.MaxTrainRows).toInt),
      vecCol, centroids)
    // clamped at 0: float error can put the mean a hair NEGATIVE, and a
    // signed value would fail the unsigned meta-field regex on read —
    // the index would silently lose its drift reference
    writeMeta(spark, dir,
      Meta(nLists, dim, Some(math.max(0L, math.round(buildErr * 1e6))),
        expectPq)) // commit (of the raw leg; see `committed` when expectPq)
  }

  /** Assign NEW vectors to the EXISTING centroids and append them — the
    * incremental-growth path (an IVF's recall degrades gracefully as the
    * corpus drifts from the trained quantizer; rebuild when it does).
    * A crash mid-append leaves a PARTIAL batch; the replay contract is
    * the caller's (a streaming foreachBatch re-runs the batch), and the
    * resulting duplicate rows are collapsed by [[topK]] and [[compact]].
    *
    * When the PQ leg exists ([[buildPq]]), the same batch is ALSO encoded
    * and appended to the code store, so both legs stay in sync (the batch
    * is lineage-pinned so the input is scanned once, not twice). Codes
    * are written FIRST: every id-based replay-suppression check (e.g.
    * [[SemDedup.applyBatchIndexed]] rule 3) reads the VECTORS store, so
    * the store that gates replay must land LAST. A crash between the two
    * writes leaves orphan codes with NO vectors — the replayed batch is
    * NOT suppressed, re-runs this append, and the duplicate codes
    * collapse in [[topKPq]]/[[compact]] (the reverse order would leave
    * vectors that suppress the replay while the code store permanently
    * lacks the batch — a silent ADC-probe hole). Orphan codes are
    * harmless meanwhile: [[topKPq]]'s exact re-rank inner-joins the raw
    * vectors, so an id without a vector can never be emitted. */
  def appendVectors(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = corpus.sparkSession
    val m = requireMeta(spark, dir)
    val centroids = readCentroids(spark, dir)
    val a = assigned(corpus, idCol, vecCol, dir, centroids, m.dim)
    readPqMeta(spark, dir) match {
      case None => writeAssigned(a, dir)
      case Some(pm) =>
        val model = readPqModel(spark, dir)
        val pinned = graft.ops.Checkpoints.pin(a)
        writeCodes(pinned, dir, model, pm, centroids)
        writeAssigned(pinned, dir)
    }
  }

  /** `(id, vec, list)` — the batch with its list assignment. */
  private def assigned(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      centroids: Array[Array[Double]], dim: Int): DataFrame =
    Similarity.withIvfList(
      corpus.select(col(idCol).cast(LongType).as("id"),
        dimGuarded(col(vecCol).cast(ArrayType(DoubleType)), dim,
          s"IVF index at $dir").as("vec")),
      "vec", centroids, listCol = "list")

  private def writeAssigned(a: DataFrame, dir: String): Unit =
    a.repartition(col("list"))
      // list prefix: satisfies the partitioned writer's required ordering
      // so it inserts no extra Sort; id order gives row-group min/max
      // stats for id-predicate scans (same reasoning as the catalogs)
      .sortWithinPartitions("list", "id")
      .write.mode("append").partitionBy("list").parquet(s"$dir/vectors")

  private def writeVectors(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      centroids: Array[Array[Double]], dim: Int): Unit =
    writeAssigned(assigned(corpus, idCol, vecCol, dir, centroids, dim), dir)

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
    graft.ops.Listing.driverSide(spark) {
      spark.read.schema(VecSchema).parquet(s"$dir/vectors")
    }
  }

  // ------------------------------------------------------- compaction

  private def dataFiles(
      f: FileSystem, dir: String, sub: String = "vectors"): Seq[Path] = {
    def walk(p: Path): Seq[Path] = {
      val entries = f.listStatus(p).toSeq
      entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath) ++
        entries.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
          .flatMap(s => walk(s.getPath))
    }
    val root = new Path(s"$dir/$sub")
    if (f.exists(root)) walk(root) else Seq.empty
  }

  /** Parquet data files per list — the per-list compaction trigger. A
    * streaming ingest appends up to one file per touched list per
    * micro-batch; like the dedup catalogs, the steady-state floor is one
    * file per list, so compaction decisions at scale must be per list
    * (LSM-style), never a whole-index rewrite per trigger-window. */
  def listFileCounts(spark: SparkSession, dir: String): Map[Int, Int] =
    partitionStats(spark, dir, "vectors", "list=")
      .map { case (l, s) => (l, s._1) }

  /** Parquet bytes per list — the growth signal behind
    * [[graft.ops.GrowthPolicy]]: a list should stay file-sized, and when
    * the average outgrows the policy target the index wants a rebuild
    * under a larger `nLists` (the list count is trained into the
    * quantizer, so growing it is a retrain, not a reshuffle). */
  def listByteSizes(spark: SparkSession, dir: String): Map[Int, Long] =
    partitionStats(spark, dir, "vectors", "list=")
      .map { case (l, s) => (l, s._2) }

  private def partitionStats(
      spark: SparkSession, dir: String, sub: String,
      prefix: String): Map[Int, (Int, Long)] =
    graft.ops.GrowthPolicy.partitionStats(
      fs(spark, dir), new Path(s"$dir/$sub"), prefix)

  /** Mean squared distance of a vector frame to its assigned centroid —
    * the quantization error. One distributed aggregate, no collect
    * (score identity: ‖v−c‖² = v·v − 2·(v·c − ½c·c), and the assignment
    * argmax already maximizes the parenthesized score). */
  def assignError(
      df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Double = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val best = array_max(array(Similarity.centroidScores(v, centroids): _*))
      .getField("score")
    // NaN on an empty (or all-null) frame, not an NPE on the null avg —
    // an empty micro-batch's drift estimate is "no evidence", and NaN
    // never trips the policy's strict > threshold
    Option(df.filter(v.isNotNull)
      .select((Similarity.dot(v, v) - lit(2.0) * best).as("__d2"))
      .agg(avg(col("__d2"))).head.get(0))
      .fold(Double.NaN)(_.asInstanceOf[Double])
  }

  /** Centroid-drift estimate: the quantization error of `batch` (e.g.
    * the vectors about to be appended, or a recent sample) relative to
    * the build-time reference. ≈1 means the trained quantizer still fits;
    * sustained ratios above the policy threshold mean recall is decaying
    * and the index wants a retrain ([[graft.ops.GrowthPolicy]]). None on
    * indexes built before the reference statistic existed. */
  def driftRatio(
      spark: SparkSession, dir: String,
      batch: DataFrame, vecCol: String): Option[Double] =
    driftRatioWith(requireMeta(spark, dir), readCentroids(spark, dir),
      batch, vecCol)

  /** [[driftRatio]] against already-loaded meta/centroids — [[maintain]]
    * holds both, and re-reading the centroid parquet per maintenance
    * tick would be repeated object-store I/O for values in hand. */
  private def driftRatioWith(
      m: Meta, centroids: Array[Array[Double]],
      batch: DataFrame, vecCol: String): Option[Double] =
    m.buildErrE6.filter(_ > 0).map { ref =>
      assignError(batch, vecCol, centroids) / (ref / 1e6)
    }

  /** Occupancy signals through the shared policy; `autoCompact = true`
    * runs the recommended per-list compactions (the only safely in-place
    * action — a Rebucket here means RETRAIN into a fresh dir under more
    * lists, and Retrain is likewise a caller-owned rebuild + cutover).
    * `driftBatch` supplies the vectors to estimate drift over (commonly
    * the batch just appended). */
  def maintain(
      spark: SparkSession, dir: String,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      autoCompact: Boolean = false,
      driftBatch: Option[(DataFrame, String)] = None
  ): Seq[graft.ops.GrowthPolicy.Action] = {
    val m = requireMeta(spark, dir)
    val drift = driftBatch.flatMap { case (df, vc) =>
      driftRatioWith(m, readCentroids(spark, dir), df, vc)
    }
    val stats = partitionStats(spark, dir, "vectors", "list=")
    val acts = graft.ops.GrowthPolicy.recommend(
      m.nLists, stats.map { case (l, s) => (l, s._2) },
      stats.map { case (l, s) => (l, s._1) },
      policy, driftRatio = drift)
    if (autoCompact) acts.foreach {
      case graft.ops.GrowthPolicy.Compact(ls) =>
        compact(spark, dir, lists = Some(ls))
      case _ => ()
    }
    acts
  }

  /** Rebuild the index from its OWN stored vectors into a fresh dir —
    * the executable body of [[graft.ops.GrowthPolicy]]'s Retrain (same
    * list count, fresh quantizer for drifted data) and Rebucket (more
    * lists — the list count is trained into the quantizer, so an IVF
    * re-shard IS a retrain). Replay-duplicated ids collapse first (one
    * row per id, like [[compact]]); an existing PQ leg is re-trained on
    * the new assignment so the rebuilt index serves the same probes.
    * `toDir` must be fresh — the [[graft.ops.VersionedStore]] cutover
    * supplies one and owns the serving swap. */
  def retrain(
      spark: SparkSession, fromDir: String, toDir: String,
      nLists: Option[Int] = None): Unit = {
    val m = requireMeta(spark, fromDir)
    val pq = readPqMeta(spark, fromDir)
    val vecs = vectors(spark, fromDir)
      .groupBy(col("id")).agg(first(col("vec")).as("vec"))
    // when the source carries a PQ leg, the rebuilt IVF meta DECLARES it
    // (expectPq) before the leg exists: buildPq needs that meta to run,
    // so the overall retrain can't put its commit marker last — instead
    // the declaration keeps the version un-[[committed]] until the PQ
    // meta (written last by buildPq) lands
    build(vecs, "id", "vec", toDir, nLists.getOrElse(m.nLists),
      expectPq = pq.isDefined)
    pq.foreach(pm =>
      buildPq(spark, toDir, pm.m, pm.k, residual = pm.residual))
  }

  /** [[maintain]] over a [[graft.ops.VersionedStore]] root — the
    * fully-executable lifecycle: signals through the shared policy,
    * auto-compact in place, and the recommend-only actions EXECUTED as a
    * [[retrain]] into the next version (Rebucket retrains under the
    * policy's doubled list count; Retrain keeps the count) with retired
    * predecessors swept. Readers keep resolving a committed version at
    * every instant (crash mid-retrain leaves the new version
    * uncommitted and the old one serving — the VersionedStore crash
    * contract). Returns the serving dir after maintenance plus the
    * actions that tripped. */
  def maintainVersioned(
      spark: SparkSession, root: String,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      autoCompact: Boolean = true,
      driftBatch: Option[(DataFrame, String)] = None
  ): (String, Seq[graft.ops.GrowthPolicy.Action]) = {
    // the STRICT probe: an IVF meta alone doesn't commit a version whose
    // meta declares a PQ leg (retrain crash window) — see [[committed]]
    val committed = (d: String) => this.committed(spark, d)
    val cur = graft.ops.VersionedStore.current(spark, root, committed)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed IVF index under versioned root $root"))
    // recommend first WITHOUT the in-place compaction — a tripped
    // Rebucket/Retrain rebuilds the whole index into the next version
    // ([[retrain]] collapses replay duplicates itself), so compacting
    // the predecessor it retires is wasted I/O
    val acts = maintain(spark, cur, policy, autoCompact = false, driftBatch)
    val rebuilt = acts.collectFirst {
      case graft.ops.GrowthPolicy.Rebucket(n, _) =>
        graft.ops.VersionedStore.cutover(spark, root, committed)(
          retrain(spark, cur, _, Some(n)))
      case graft.ops.GrowthPolicy.Retrain(_) =>
        graft.ops.VersionedStore.cutover(spark, root, committed)(
          retrain(spark, cur, _))
    }
    if (rebuilt.isEmpty && autoCompact) acts.foreach {
      case graft.ops.GrowthPolicy.Compact(ls) =>
        compact(spark, cur, lists = Some(ls))
      case _ => ()
    }
    rebuilt.foreach(_ => graft.ops.VersionedStore.retire(spark, root, committed))
    (rebuilt.getOrElse(cur), acts)
  }

  /** Rewrite the selected lists (all of them when `lists = None`) as one
    * id-sorted file each, collapsing duplicate ids from replayed appends
    * to one row. Same duplicate-tolerant swap as the catalogs: merged
    * files MOVE IN before the inputs are deleted, so a crash anywhere
    * leaves (at worst) duplicate vectors — and [[topK]]'s ranking is
    * duplicate-stable (same id ⇒ same cosine ⇒ ties break on id), so
    * readers tolerate the window. With a PQ leg present, the code store
    * compacts the same way. */
  def compact(
      spark: SparkSession, dir: String,
      lists: Option[Seq[Int]] = None): Unit = {
    if (readMeta(spark, dir).isEmpty) return
    compactSub(spark, dir, "vectors", VecSchema, "vec", lists)
    if (readPqMeta(spark, dir).isDefined)
      compactSub(spark, dir, "codes", CodeSchema, "pq_codes", lists)
  }

  private def compactSub(
      spark: SparkSession, dir: String, sub: String, schema: StructType,
      valueCol: String, lists: Option[Seq[Int]]): Unit = {
    val f = fs(spark, dir)
    val inScope: Path => Boolean = lists match {
      case None => _ => true
      case Some(ls) =>
        val names = ls.map(l => s"list=$l").toSet
        p => names.contains(p.getParent.getName)
    }
    val oldFiles = dataFiles(f, dir, sub).filter(inScope)
    if (oldFiles.isEmpty) return
    val subDir = s"$dir/$sub"
    val scoped = lists match {
      case Some(ls) => graft.ops.Listing.driverSide(spark) {
        spark.read.schema(schema).parquet(subDir)
      }.filter(col("list").isin(ls: _*))
      case None => graft.ops.Listing.driverSide(spark) {
        spark.read.schema(schema).parquet(subDir)
      }
    }
    val tmp = s"$dir/_compacting"
    f.delete(new Path(tmp), true)
    scoped
      .groupBy(col("list"), col("id")).agg(first(col(valueCol)).as(valueCol))
      .select(col("id"), col(valueCol), col("list"))
      .repartition(col("list"))
      .sortWithinPartitions("list", "id") // list prefix: see writeAssigned
      .write.mode("overwrite").partitionBy("list").parquet(tmp)
    for (listDir <- f.listStatus(new Path(tmp)).toSeq
         if listDir.isDirectory && listDir.getPath.getName.startsWith("list=")) {
      val target = new Path(subDir, listDir.getPath.getName)
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

  // ----------------------------------------------------------- PQ leg
  //
  // The raw index stores float64 vectors: at 10⁹ × 768-dim that is ~6 TB
  // scanned across probed lists. The PQ leg stores m-BYTE codes per
  // vector in the same list partitioning (768-dim × m=96 → 64× smaller),
  // probes score codes by ADC table lookup, and only the per-query
  // shortlist finalists read their float vectors for the exact re-rank —
  // the probe's scan bytes drop by the compression ratio while recall is
  // recovered by the re-rank (the IVF-PQ shape of Jégou et al. 2011,
  // "Product Quantization for Nearest Neighbor Search", and the FAISS
  // IndexIVFPQ design — public literature).

  /** PQ-leg layout parameters; the leg's COMMIT MARKER (written LAST by
    * [[buildPq]] — a crashed PQ build fails every code reader loudly
    * while the raw index stays fully usable). `residual = true` means
    * codes encode v̂ − ĉ_list (the assigned coarse centroid, normalized)
    * instead of v̂ — part of the LAYOUT (codes from one scheme scored
    * under the other are garbage), so it lives in the commit marker;
    * absent on legs built before the residual scheme → raw. */
  case class PqMeta(m: Int, k: Int, dsub: Int, residual: Boolean = false)

  private def pqMetaPath(dir: String) = new Path(dir, "_graft_ivf_pq.json")

  private def writePqMeta(spark: SparkSession, dir: String, m: PqMeta): Unit = {
    val out = fs(spark, dir).create(pqMetaPath(dir), true)
    val res = if (m.residual) 1 else 0
    try out.write(
      s"""{"m":${m.m},"k":${m.k},"dsub":${m.dsub},"residual":$res}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readPqMeta(spark: SparkSession, dir: String): Option[PqMeta] = {
    val p = pqMetaPath(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def fieldOpt(name: String): Option[Int] =
        s""""$name":(\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
      def field(name: String): Int =
        fieldOpt(name).getOrElse(throw new IllegalStateException(
          s"IVF-PQ meta at $p is missing '$name': $text"))
      Some(PqMeta(field("m"), field("k"), field("dsub"),
        fieldOpt("residual").exists(_ != 0)))
    }
  }

  /** v̂ − ĉ_list: the PQ-residual of a vector against its assigned coarse
    * centroid, both L2-normalized — the IVF-PQ residual refinement
    * (Jégou et al. 2011 §IV; FAISS IndexIVFPQ encodes residuals by
    * default). Residual magnitudes shrink with cluster tightness, so the
    * per-subspace codebooks spend their 256 cells on a much smaller cell
    * volume than raw-vector coding — directly more ADC resolution. The
    * NORMALIZED centroid is the anchor (coarse centroids are trained on
    * raw vectors whose norms need not be 1; any fixed anchor keeps the
    * dot decomposition exact, and the unit-sphere projection keeps it
    * CLOSE to v̂, which is what shrinks the residuals). */
  private def residualCol(
      vec: Column, list: Column, centroids: Array[Array[Double]]): Column = {
    val anchors = typedLit(centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      (if (n == 0.0) c else c.map(_ / n)).toSeq
    }.toSeq)
    zip_with(Pq.normalized(vec), element_at(anchors, list + lit(1)),
      (x, y) => x - y)
  }

  /** dot(q̂, ĉ_list) — the per-(query, probed-list) scalar that restores
    * absolute cosine scale to residual-ADC scores (see [[topKPq]]). */
  private def anchorBias(
      qv: Column, list: Column, centroids: Array[Array[Double]]): Column = {
    val anchors = typedLit(centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      (if (n == 0.0) c else c.map(_ / n)).toSeq
    }.toSeq)
    Similarity.dot(Pq.normalized(qv), element_at(anchors, list + lit(1)))
  }

  private def requirePqMeta(spark: SparkSession, dir: String): PqMeta =
    readPqMeta(spark, dir).getOrElse(throw new IllegalStateException(
      s"no PQ leg on the IVF index at $dir (missing ${pqMetaPath(dir)} — " +
        "never built, or a crashed buildPq left no commit marker); " +
        "buildPq() it first"))

  /** Train PQ codebooks on the indexed vectors and write the code store
    * (`dir/codes/`, partitioned by `list` like the vectors) plus the
    * persisted model (`dir/pq_model/`). The PQ meta is the commit
    * marker, written LAST. Requires the raw index; refuses an existing
    * PQ leg (retrain into a fresh index, or delete the leg first).
    *
    * `residual = true` (the default) trains and encodes v̂ − ĉ_list
    * ([[residualCol]]) — the standard IVF-PQ refinement: residuals are
    * far tighter than raw unit vectors, so the same m bytes carry more
    * resolution and ADC ranking (and thus rerank recall) improves. */
  def buildPq(
      spark: SparkSession, dir: String, m: Int, k: Int = 256,
      targetRows: Long = 20000L, seed: Long = 42L,
      residual: Boolean = true): Unit = {
    val meta = requireMeta(spark, dir)
    require(readPqMeta(spark, dir).isEmpty,
      s"IVF index at $dir already has a PQ leg; buildPq into a fresh " +
        "index (appendVectors keeps an existing leg in sync)")
    require(meta.dim % m == 0,
      s"dim ${meta.dim} not divisible into $m subspaces")
    val f = fs(spark, dir)
    // clear crashed-build remnants (codes/model without the commit meta)
    Seq("codes", "pq_model").foreach(s => f.delete(new Path(s"$dir/$s"), true))
    val vecs = vectors(spark, dir)
    val pm0 = PqMeta(m, 0, 0, residual) // scheme for writeCodes; k/dsub from model
    val centroids = readCentroids(spark, dir)
    val model =
      if (residual) Pq.train(
        vecs.select(residualCol(col("vec"), col("list"), centroids).as("__r"),
          col("id"), col("list")),
        "__r", m, k, targetRows, seed, normalize = false)
      else Pq.train(vecs, "vec", m, k, targetRows, seed)
    import spark.implicits._
    Seq((model.m, model.k, model.dsub, model.cents.toSeq))
      .toDF("m", "k", "dsub", "cents")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pq_model")
    writeCodes(vecs, dir, model, pm0, centroids)
    writePqMeta(spark, dir,
      PqMeta(model.m, model.k, model.dsub, residual)) // commit
  }

  private def writeCodes(
      a: DataFrame, dir: String, model: Pq.PqModel, pm: PqMeta,
      centroids: Array[Array[Double]]): Unit = {
    val shim = org.apache.spark.sql.GraftColumnShim
    val codeInput =
      if (pm.residual) residualCol(col("vec"), col("list"), centroids)
      else Pq.normalized(col("vec"))
    a.select(col("id"),
        shim.column(graft.functions.PqEncode(shim.expression(codeInput),
          model.cents, model.m, model.k, model.dsub)).as("pq_codes"),
        col("list"))
      .repartition(col("list"))
      .sortWithinPartitions("list", "id") // list prefix: see writeAssigned
      .write.mode("append").partitionBy("list").parquet(s"$dir/codes")
  }

  /** The persisted codebooks, validated against the PQ meta. */
  def readPqModel(spark: SparkSession, dir: String): Pq.PqModel = {
    val pm = requirePqMeta(spark, dir)
    val rows = spark.read.parquet(s"$dir/pq_model")
      .select(col("m"), col("k"), col("dsub"), col("cents")).collect()
    require(rows.length == 1,
      s"IVF-PQ model at $dir/pq_model has ${rows.length} rows, expected 1")
    val r = rows.head
    val model = Pq.PqModel(r.getInt(0), r.getInt(1), r.getInt(2),
      r.getSeq[Double](3).toArray)
    require(model.m == pm.m && model.k == pm.k && model.dsub == pm.dsub,
      s"IVF-PQ model (${model.m},${model.k},${model.dsub}) does not match " +
        s"meta (${pm.m},${pm.k},${pm.dsub}) at $dir")
    require(model.cents.length == model.m * model.k * model.dsub,
      s"IVF-PQ model at $dir: ${model.cents.length} centroid doubles, " +
        s"expected ${model.m * model.k * model.dsub}")
    model
  }

  /** All stored PQ codes (parity tests; probes use [[topKPq]]). */
  def codes(spark: SparkSession, dir: String): DataFrame = {
    requirePqMeta(spark, dir)
    graft.ops.Listing.driverSide(spark) {
      spark.read.schema(CodeSchema).parquet(s"$dir/codes")
    }
  }

  /** ANN top-k through the compressed leg: probe the `nProbe` nearest
    * lists per query, score the pruned CODE scan by ADC lookup (m byte
    * lookups per row — no float vector reads), shortlist
    * `max(k, rerank)` finalists per query, then exact-cosine re-rank
    * ONLY the finalists against the raw vectors (same list pruning, and
    * the finalist set is broadcast-small: queries × rerank). Output
    * schema matches [[topK]]. Duplicate-tolerant like [[topK]]: replayed
    * ids collapse before both rankings. */
  def topKPq(
      spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
      rerank: Int = 50): DataFrame = {
    val m = requireMeta(spark, dir)
    val pm = requirePqMeta(spark, dir)
    val model = readPqModel(spark, dir)
    val centroids = readCentroids(spark, dir)
    val shim = org.apache.spark.sql.GraftColumnShim
    // pinned: the probed-list collect, the ADC join and the re-rank join
    // all consume the query frame (see topK)
    // the LUT is computed BEFORE the probe-list explode: after it every
    // query carries nProbe rows, and a post-explode LUT would evaluate
    // (and pin, and broadcast) the m×k table nProbe times per query.
    // This holds for the RESIDUAL scheme too — inner products decompose
    // linearly (dot(q̂, v̂) = dot(q̂, ĉ_l) + dot(q̂, r)), so the list-
    // dependent part is the SCALAR `__bias` below, not a per-list LUT as
    // in FAISS's L2 formulation (whose ‖q − c_l − r‖² has cross terms).
    val q = graft.ops.Checkpoints.pin(queries
      .select(col(idCol).cast(LongType).as("query_id"),
        dimGuarded(col(vecCol).cast(ArrayType(DoubleType)), m.dim,
          s"IVF-PQ probe against $dir").as("__qv"))
      .withColumn("__lut", shim.column(graft.functions.PqLut(
        shim.expression(Pq.normalized(col("__qv"))),
        model.cents, model.m, model.k, model.dsub)))
      .withColumn("list",
        Similarity.probeListsCol(col("__qv"), centroids, nProbe))
      // post-explode (needs the probed list); one dot per (query, probe)
      .withColumn("__bias",
        if (pm.residual) anchorBias(col("__qv"), col("list"), centroids)
        else lit(0.0)))
    val probed = q.select(col("list")).distinct().collect().map(_.getInt(0))
    val prunedCodes = codes(spark, dir)
      .filter(col("list").isin(probed.toSeq: _*))
    val scored = prunedCodes
      .join(broadcast(q.select(col("list"), col("query_id"), col("__lut"),
        col("__bias"))), Seq("list"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("adc", col("__bias") + shim.column(graft.functions.PqAdc(
        shim.expression(col("pq_codes")), shim.expression(col("__lut")),
        model.k)))
      .groupBy(col("query_id"), col("id")).agg(max(col("adc")).as("adc"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc").desc, col("id"))
    val shortlist = scored.withColumn("rank", row_number().over(wAdc))
      .filter(col("rank") <= math.max(k, rerank))
      .select(col("query_id"), col("id"))
    // finalists (queries × rerank) carry their query vector — broadcast
    // against the pruned raw-vector scan; only finalist rows score cosine
    val fin = shortlist
      .join(q.select(col("query_id"), col("__qv")).distinct(), Seq("query_id"))
    val prunedVecs = vectors(spark, dir)
      .filter(col("list").isin(probed.toSeq: _*))
      .select(col("id"), col("vec"))
    val exact = prunedVecs.join(broadcast(fin), Seq("id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("vec")))
      .groupBy(col("query_id"), col("id"))
      .agg(max(col("cosine")).as("cosine"))
    val wCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id"))
    exact.withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}

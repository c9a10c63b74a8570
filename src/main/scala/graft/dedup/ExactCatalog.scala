package graft.dedup

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The persistent EXACT-dedup catalog — the 100 TB shape for the
  * `(fp, h2)` state [[Dedup.dedupIncremental]] carries between crawls,
  * with the same layout discipline (and the same retention/compaction
  * answer to monotone growth — r7 verdict stretch item 6) as the
  * near-dup [[BandedCatalog]]:
  *
  *  - parquet under `dir`, partitioned by `bucket = fp mod numBuckets`,
  *    rows `(fp, h2, added)`, files sorted by `fp` within each bucket —
  *    a batch's anti-join reads only the buckets its fingerprints hash
  *    into (`bucket IN (…)` partition filter), plus an `fp IN (…)`
  *    row-group pushdown when the batch's distinct fingerprints fit
  *    under `maxPushdownKeys`. 16 bytes/doc of payload: at 10⁹ distinct
  *    docs the catalog is ~16 GB — trivially smaller than the corpus it
  *    shadows.
  *  - `h2` is the HASHED collision re-check (`xxhash64` — an
  *    independent family from `fingerprint64`, so a false drop needs a
  *    simultaneous 2-hash collision). The raw-text `secondKey` variant
  *    of [[Dedup.dedupIncremental]] stays available for byte-exact
  *    semantics; a persistent catalog carrying full texts would not be
  *    a catalog.
  *  - **`added` tag + retention**: every row carries the caller's
  *    monotone batch tag; [[compact]] can drop rows below a cutoff, so
  *    a year-long pipeline stops suppressing new documents against
  *    crawls it no longer serves. An expired document that re-appears
  *    is ADMITTED once and re-enters the catalog with the current tag.
  *  - **crash/duplicate contract** (same as BandedCatalog): appends
  *    land after survivor delivery, compaction moves merged files in
  *    before deleting inputs; duplicate `(fp, h2)` rows are harmless
  *    (the anti-join suppresses against ANY matching row) and collapse
  *    at the next compaction, keeping the LATEST `added` tag.
  */
object ExactCatalog {

  val DefaultBuckets = 64
  val DefaultMaxPushdownKeys = 20000

  /** Overflow probes push at most this many per-bucket fp RANGES (an OR
    * of BETWEENs is a pure data-column predicate parquet can evaluate
    * against row-group min/max stats; past this arm count the planner
    * cost outweighs the skipping — bucket pruning alone then applies). */
  val MaxRangePushdownArms = 4096

  /** Meta `kind` tag for whole-document exact-dedup entries. The layout
    * machinery here is shared with other fingerprint catalogs (the
    * window-fp [[SubstrCatalog]]), and their dirs are byte-compatible —
    * which is exactly why the meta must say WHICH fingerprint universe
    * the rows come from: opening a window-fp catalog as a document
    * catalog (or vice versa) would anti-join documents against window
    * hashes and silently dedup nothing (or everything). Readers and
    * appenders refuse a kind mismatch. */
  val KindExact = "exact"

  private val DataSchema = StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("added", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  def bucketOf(fp: Column, numBuckets: Int): Column =
    pmod(fp, lit(numBuckets.toLong)).cast(IntegerType)

  // ------------------------------------------------------------- meta

  /** `numBuckets` is part of the layout (a different value makes
    * partition pruning drop the wrong buckets) — recorded at first
    * append, asserted on every open. */
  private def metaPath(dir: String) = new Path(dir, "_graft_exact_catalog.json")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readMeta(spark: SparkSession, dir: String): Option[Int] = {
    val p = metaPath(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      """"numBuckets":(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
        .orElse(throw new IllegalStateException(
          s"exact catalog meta at $p is malformed: $text"))
    }
  }

  /** The recorded fingerprint universe ([[KindExact]],
    * [[SubstrCatalog.Kind]], …); None for a missing meta. */
  def readMetaKind(spark: SparkSession, dir: String): Option[String] = {
    val p = metaPath(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      """"kind":"([^"]+)"""".r.findFirstMatchIn(text).map(_.group(1))
    }
  }

  private def requireKind(spark: SparkSession, dir: String, kind: String): Unit =
    readMetaKind(spark, dir) match {
      case Some(have) =>
        require(have == kind,
          s"catalog at $dir holds '$have' fingerprints; reading or appending " +
            s"it as '$kind' would mix fingerprint universes and silently " +
            "break the dedup")
      case None if readMeta(spark, dir).isDefined =>
        // kind-less meta = written before the tag existed, when every
        // catalog was document-exact — only the exact reader may accept
        // it (an untagged dir must never pass as some OTHER universe)
        require(kind == KindExact,
          s"catalog at $dir predates kind tags (document-exact era); " +
            s"refusing to open it as '$kind'")
      case None => () // no meta at all: the orphan-data guard decides
    }

  private def requireMeta(
      spark: SparkSession, dir: String, numBuckets: Int, kind: String): Unit = {
    readMeta(spark, dir).foreach { have =>
      require(have == numBuckets,
        s"exact catalog at $dir was written with numBuckets=$have; " +
          s"opening it with numBuckets=$numBuckets would prune wrong buckets")
    }
    requireKind(spark, dir, kind)
  }

  /** Data files without a meta file = rows of unknown bucketing; reading
    * them as empty silently drops all dedup state. Fail loudly (see
    * [[BandedCatalog]] — same contract; the accreting [[append]] writer
    * makes the window impossible by writing meta before the first data
    * write, while the one-shot [[rebucket]] deliberately inverts the
    * order so this guard doubles as its commit marker). */
  private def rejectOrphanData(spark: SparkSession, dir: String): Unit =
    require(dataFiles(fs(spark, dir), dir).isEmpty,
      s"catalog at $dir has parquet data but no meta file — refusing to " +
        "treat unknown-layout rows as an empty catalog; rebuild the " +
        "catalog (or restore its meta) before reading or appending")

  private def writeMeta(
      spark: SparkSession, dir: String, numBuckets: Int, kind: String): Unit = {
    val out = fs(spark, dir).create(metaPath(dir), true)
    try out.write(s"""{"numBuckets":$numBuckets,"kind":"$kind"}"""
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ----------------------------------------------------------- entries

  /** Catalog entries of a document frame: one `(fp, h2)` per doc (NOT
    * distinct-collapsed — callers feed already-collapsed survivors). */
  def entriesOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      graft.functions.GraftFunctions.fingerprint64(col(textCol)).as("fp"),
      xxhash64(col(textCol)).as("h2"))

  // ------------------------------------------------------------ append

  /** Append `(fp, h2)` entries under the caller's `added` tag: one
    * shuffle on the bucket key, at most one fp-sorted file per touched
    * bucket per call. */
  def append(
      entries: DataFrame, dir: String,
      numBuckets: Int = DefaultBuckets, added: Long = 0L,
      kind: String = KindExact): Unit = {
    val spark = entries.sparkSession
    requireMeta(spark, dir, numBuckets, kind)
    // meta BEFORE the first data write — a crash between the two must
    // leave a readable catalog, never unrecorded-layout rows
    if (readMeta(spark, dir).isEmpty) {
      rejectOrphanData(spark, dir)
      writeMeta(spark, dir, numBuckets, kind)
    } else if (readMetaKind(spark, dir).isEmpty)
      // kind-validated above (a kind-less meta only admits the exact
      // reader) — self-heal the tag so the catalog is guarded from now on
      writeMeta(spark, dir, readMeta(spark, dir).get, kind)
    val frame = entries.select(col("fp"), col("h2"), lit(added).as("added"),
      bucketOf(col("fp"), numBuckets).as("bucket"))
    // manifest bookkeeping (r18, guide §6): the touched buckets ride the
    // write itself as an observed aggregate — no extra job, no listing
    // beyond the touched dirs when the manifest is updated after commit
    val obs =
      if (graft.ops.Manifest.enabled) Some(org.apache.spark.sql.Observation())
      else None
    obs.fold(frame)(o => frame.observe(o, collect_set(col("bucket")).as("touched")))
      .repartition(col("bucket"))
      // bucket prefix: satisfies the partitioned writer's required
      // ordering so no extra Sort is planned and the fp file order
      // (row-group min/max skipping) survives — see BandedCatalog.append
      .sortWithinPartitions("bucket", "fp")
      .write.mode("append").partitionBy("bucket").parquet(dir)
    obs.foreach(o => graft.ops.Manifest.recordAppend(spark, dir,
      o.get("touched").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Number].intValue).toSeq))
  }

  // -------------------------------------------------------------- read

  /** The whole catalog (empty frame before first append). */
  def read(spark: SparkSession, dir: String,
      kind: String = KindExact): DataFrame =
    if (readMeta(spark, dir).isEmpty) {
      rejectOrphanData(spark, dir)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataSchema)
    } else {
      requireKind(spark, dir, kind)
      graft.ops.Listing.driverSide(spark) {
        spark.read.schema(DataSchema).parquet(dir)
      }
    }

  /** The catalog rows a batch can possibly match: bucket partition
    * pruning always (≤ numBuckets distinct values, one bounded collect),
    * `fp IN (…)` scan pushdown when the batch's distinct fingerprints
    * fit under `maxPushdownKeys` (files are fp-sorted, so min/max stats
    * skip row groups). `batchEntries` needs an `fp` column.
    *
    * KEY-OVERFLOW probes (window-fp batches overflow the IN cap by
    * design — ~one window per corpus token) push per-bucket fp RANGES
    * instead (r11 verdict item 6): the batch's (min, max) fp per probed
    * bucket — a ≤ numBuckets bounded collect — becomes one OR of
    * BETWEENs, a pure data-column predicate parquet evaluates against
    * row-group min/max stats. Files are fp-sorted, and hash-uniform
    * keys spread ~|batch|/numBuckets per bucket, so at healthy bucket
    * counts each range is tight and row-group skipping engages even
    * when the key list itself cannot be pushed. Sound because a catalog
    * row equal to some batch fp lies inside its OWN bucket's batch
    * range by construction. */
  def readForBatch(
      spark: SparkSession, dir: String, batchEntries: DataFrame,
      maxPushdownKeys: Int = DefaultMaxPushdownKeys,
      kind: String = KindExact): DataFrame =
    readMeta(spark, dir) match {
      case None =>
        rejectOrphanData(spark, dir)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataSchema)
      case Some(numBuckets) =>
        requireKind(spark, dir, kind)
        // ONE bounded collect in the common case (see
        // [[BandedCatalog.readForBatch]]): capped distinct fingerprints,
        // buckets derived driver-side (bucket = pmod(fp, numBuckets));
        // only a key overflow pays a second job, for the per-bucket
        // ranges (≤ numBuckets rows). The collect runs BEFORE any
        // relation is built, and the relation covers ONLY the probed
        // buckets' directories ([[BandedCatalog.readBucketDirs]]) — the
        // per-trigger file listing is O(probed buckets), not O(catalog).
        val fps = batchEntries.select(col("fp"))
          .distinct().limit(maxPushdownKeys + 1)
          .collect().map(_.getLong(0))
        if (fps.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataSchema)
        else if (fps.length > maxPushdownKeys) {
          val ranges = batchEntries
            .select(bucketOf(col("fp"), numBuckets).as("bucket"), col("fp"))
            .groupBy(col("bucket"))
            .agg(min(col("fp")).as("lo"), max(col("fp")).as("hi"),
              countDistinct(col("fp")).as("n"))
            .collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          readRangeSplit(spark, dir, ranges.toIndexedSeq, numBuckets)
        } else {
          val buckets = fps
            .map(f => (((f % numBuckets) + numBuckets) % numBuckets).toInt)
            .distinct
          BandedCatalog.readBucketDirs(spark, dir, buckets.toSeq, DataSchema, numBuckets)
            .filter(col("fp").isin(fps.toSeq: _*))
        }
    }

  /** [[readForBatch]] for a key set that is ALREADY on the driver (r18,
    * guide §1.2 — remove work that buys nothing): probes whose keys are
    * GENERATED driver-side (the video sig/cnt tiers derive them from
    * the collected candidate vids) were paying a per-probe
    * distinct+limit+collect job round just to get back keys the caller
    * could compute itself. Here bucket derivation, overflow detection
    * and the density split are pure driver arithmetic — zero Spark jobs
    * before the pruned scan itself. Read semantics identical to
    * [[readForBatch]]: a sound superset, `fp IN (…)` pushdown under
    * `maxPushdownKeys`, density-split per-bucket ranges past it. */
  def readForKeys(
      spark: SparkSession, dir: String, keys: Array[Long],
      maxPushdownKeys: Int = DefaultMaxPushdownKeys,
      kind: String = KindExact): DataFrame =
    readMeta(spark, dir) match {
      case None =>
        rejectOrphanData(spark, dir)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataSchema)
      case Some(numBuckets) =>
        requireKind(spark, dir, kind)
        val fps = keys.distinct
        def bucketOfKey(f: Long): Int =
          (((f % numBuckets) + numBuckets) % numBuckets).toInt
        if (fps.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataSchema)
        else if (fps.length > maxPushdownKeys) {
          val ranges = fps.groupBy(bucketOfKey).map { case (b, ks) =>
            (b, ks.min, ks.max, ks.length.toLong)
          }.toIndexedSeq
          readRangeSplit(spark, dir, ranges, numBuckets)
        } else {
          val buckets = fps.map(bucketOfKey).distinct
          BandedCatalog.readBucketDirs(spark, dir, buckets.toSeq, DataSchema, numBuckets)
            .filter(col("fp").isin(fps.toSeq: _*))
        }
    }

  /** The DENSITY-SPLIT overflow read shared by [[readForBatch]] and
    * [[readForKeys]] (r17, guide §1.2/§2.3 — don't pay a predicate that
    * skips nothing). k hash-uniform keys inside one bucket span
    * ~(k−1)/(k+1) of that bucket's fp domain, so a per-bucket range only
    * skips row groups while the bucket holds ~≤3 batch keys (coverage
    * ≤ 50%). Split the probed buckets by that density:
    *  - 1 key  → the range IS the key: fold every such bucket into ONE
    *    `fp IN (…)` arm (a single InSet node — hash-set eval instead of
    *    the per-row OR walk that made ~600 point ranges cost ~3 s per
    *    trigger on the window-fp bench row);
    *  - 2-3 keys → keep the BETWEEN arm (still skips);
    *  - >3 keys (dense) → read that bucket UNFILTERED in a second scan —
    *    its range covers most of the bucket anyway, and keeping dense
    *    buckets out of the filtered scan keeps the filter
    *    parquet-convertible for the sparse ones.
    * Both scans list disjoint bucket dirs (still O(probed buckets));
    * each read stays a sound SUPERSET — the downstream anti-join does
    * the equality. `ranges` rows are (bucket, lo, hi, nDistinct). */
  private def readRangeSplit(
      spark: SparkSession, dir: String,
      ranges: IndexedSeq[(Int, Long, Long, Long)], numBuckets: Int): DataFrame = {
    // BALANCED or-tree: a left-deep reduce of ~1k arms recurses ~1k deep
    // through every Catalyst tree walk (StackOverflow on default
    // stacks); pairwise folding keeps depth at log2(arms)
    def orBalanced(xs: IndexedSeq[Column]): Column =
      if (xs.length == 1) xs.head
      else orBalanced(xs.grouped(2)
        .map(g => if (g.length == 2) g(0) || g(1) else g(0)).toIndexedSeq)
    val (skippable, dense) = ranges.partition(_._4 <= 3L)
    val denseRead =
      if (dense.isEmpty) None
      else Some(BandedCatalog.readBucketDirs(
        spark, dir, dense.map(_._1).toSeq, DataSchema, numBuckets))
    val sparseRead =
      if (skippable.isEmpty) None
      else {
        val base = BandedCatalog.readBucketDirs(
          spark, dir, skippable.map(_._1).toSeq, DataSchema, numBuckets)
        val singles = skippable.filter(_._4 == 1L).map(_._2)
        val multi = skippable.filter(_._4 > 1L)
        val arms =
          (if (singles.isEmpty) IndexedSeq.empty[Column]
           else IndexedSeq(col("fp").isin(singles.toSeq: _*))) ++
            multi.map { case (_, lo, hi, _) =>
              col("fp").between(lo, hi) }
        if (arms.length > MaxRangePushdownArms) Some(base)
        else Some(base.filter(orBalanced(arms)))
      }
    (sparseRead, denseRead) match {
      case (Some(s), Some(d)) => s.unionAll(d)
      case (Some(s), None) => s
      case (None, Some(d)) => d
      case (None, None) => // unreachable: callers pass non-empty ranges
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataSchema)
    }
  }

  // ------------------------------------------------------- incremental

  /** One crawl/micro-batch against the persistent catalog: in-batch
    * collapse, anti-join against the PRUNED catalog read, survivors
    * pinned, DELIVERED via the callback, then appended under `added`,
    * and returned. Per-batch work is O(batch × bucket occupancy), never
    * O(catalog).
    *
    * Write your downstream inside `deliver`, not after the call: the
    * append must land AFTER survivor delivery (the crash contract in
    * the class doc) — a crash between an already-landed append and a
    * post-return downstream write would suppress those documents on
    * replay without them ever having been delivered (at-most-once
    * loss). With `deliver`, a crash anywhere replays the batch into
    * at-least-once delivery, same as [[graft.streaming
    * .StreamingNearDedup.applyBatch]]. */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, textCol: String,
      numBuckets: Int = DefaultBuckets, added: Long = 0L,
      maxPushdownKeys: Int = DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    // pin the in-batch collapse once: it feeds the pushdown probe, the
    // anti-join AND (via survivors) the append — unpinned, the window
    // would re-evaluate for each
    val fresh = graft.ops.Checkpoints.pin(
      Dedup.dedupExact(batch, idCol, textCol)
        .withColumn("__fp", graft.functions.GraftFunctions.fingerprint64(col(textCol)))
        .withColumn("__h2", xxhash64(col(textCol))))
    val cat = readForBatch(
      spark, dir, fresh.select(col("__fp").as("fp")), maxPushdownKeys)
    val survivors = graft.ops.Checkpoints.pin(
      fresh.join(
        cat.select(col("fp").as("__cfp"), col("h2").as("__ch2")),
        col("__fp") === col("__cfp") && col("__h2") === col("__ch2"),
        "left_anti"))
    val out = survivors.drop("__fp", "__h2")
    deliver(out) // delivery BEFORE the append — see scaladoc
    // layout from the catalog's meta when it exists (`numBuckets` is the
    // CREATE-TIME default only — see StreamingNearDedup.applyBatch): the
    // read above already pruned under the meta count, and the append
    // must land in the same layout
    append(survivors.select(col("__fp").as("fp"), col("__h2").as("h2")),
      dir, readMeta(spark, dir).getOrElse(numBuckets), added)
    out
  }

  // -------------------------------------------------------- rebucket

  /** Re-shard the catalog into `toDir` under a DIFFERENT bucket count —
    * the growth path when the survivor count outgrows the bucket choice
    * (a bucket should stay file-sized; `numBuckets` is fixed per layout
    * because `bucket = fp mod numBuckets` IS the pruning contract).
    *
    * Deliberately a rebuild-into-fresh-dir, not an in-place mutation: a
    * directory-level re-shard has no atomic swap on HDFS-like stores,
    * while this shape needs none — the SOURCE stays readable and
    * untouched throughout (writers pause, readers keep going), the new
    * layout lands complete (one bucket-shuffled write, rows collapsed
    * like [[compact]], then meta LAST as the commit marker — same
    * discipline as `IvfIndex.build`: a one-shot build, unlike the
    * accreting [[init]] path, can afford meta-as-commit), and the
    * caller cuts over by path. A crash mid-rebucket leaves a `toDir`
    * with rows but NO meta, so every reader fails loudly instead of
    * silently accepting a partial fingerprint set (which would readmit
    * duplicates); rerun into a FRESH target (the non-empty-target guard
    * makes reuse refuse loudly). */
  def rebucket(
      spark: SparkSession, fromDir: String, toDir: String,
      newBuckets: Int): Unit = {
    require(newBuckets > 0, s"newBuckets must be positive: $newBuckets")
    require(readMeta(spark, fromDir).isDefined,
      s"no exact catalog at $fromDir to rebucket")
    require(readMeta(spark, toDir).isEmpty &&
      dataFiles(fs(spark, toDir), toDir).isEmpty,
      s"rebucket target $toDir is not empty; use a fresh dir")
    // kind-agnostic layout op: read under the source's OWN kind (the
    // universe carries over to toDir's meta below)
    read(spark, fromDir, readMetaKind(spark, fromDir).getOrElse(KindExact))
      .groupBy(col("fp"), col("h2")).agg(max(col("added")).as("added"))
      .select(col("fp"), col("h2"), col("added"),
        bucketOf(col("fp"), newBuckets).as("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "fp") // see append(): bucket prefix
      .write.mode("append").partitionBy("bucket").parquet(toDir)
    // manifest before meta: the meta is the commit marker, so a crash
    // here leaves an uncommitted dir whether or not the manifest landed
    graft.ops.Manifest.rebuild(spark, toDir)
    // commit marker: rows are complete; kind carries over — a rebucket
    // never changes the fingerprint universe
    writeMeta(spark, toDir, newBuckets,
      readMetaKind(spark, fromDir).getOrElse(KindExact))
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
    val root = new Path(dir)
    if (f.exists(root)) walk(root) else Seq.empty
  }

  def fileCount(spark: SparkSession, dir: String): Int =
    dataFiles(fs(spark, dir), dir).size

  /** Parquet data files per bucket — the per-bucket compaction trigger
    * (see [[BandedCatalog.bucketFileCounts]]: global thresholds break
    * once the steady-state floor of one file per bucket exceeds them). */
  def bucketFileCounts(spark: SparkSession, dir: String): Map[Int, Int] =
    graft.ops.GrowthPolicy.partitionStats(fs(spark, dir), new Path(dir), "bucket=")
      .map { case (b, s) => (b, s._1) }

  /** Parquet bytes per bucket — the growth signal behind
    * [[graft.ops.GrowthPolicy]]: when the mean configured-bucket size
    * outgrows the policy target, the catalog wants [[rebucket]]. */
  def bucketByteSizes(spark: SparkSession, dir: String): Map[Int, Long] =
    graft.ops.GrowthPolicy.partitionStats(fs(spark, dir), new Path(dir), "bucket=")
      .map { case (b, s) => (b, s._2) }

  /** Occupancy signals through the shared policy; `autoCompact = true`
    * runs the recommended per-bucket compactions (the one safely
    * in-place action — [[rebucket]] needs a fresh dir and a caller-owned
    * cutover, so it is only ever recommended). */
  def maintain(
      spark: SparkSession, dir: String,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      autoCompact: Boolean = false): Seq[graft.ops.GrowthPolicy.Action] = {
    val numBuckets = readMeta(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no exact catalog at $dir"))
    val stats = graft.ops.GrowthPolicy.partitionStats(
      fs(spark, dir), new Path(dir), "bucket=") // ONE walk for both signals
    val acts = graft.ops.GrowthPolicy.recommend(
      numBuckets, stats.map { case (b, s) => (b, s._2) },
      stats.map { case (b, s) => (b, s._1) }, policy)
    if (autoCompact) acts.foreach {
      case graft.ops.GrowthPolicy.Compact(bs) =>
        compact(spark, dir, buckets = Some(bs))
      case _ => ()
    }
    acts
  }

  /** [[maintain]] over a [[graft.ops.VersionedStore]] root — the
    * fully-executable lifecycle (see [[BandedCatalog.maintainVersioned]]):
    * auto-compact in place, a tripped Rebucket executed as [[rebucket]]
    * into the next version, predecessors retired after the swap. */
  def maintainVersioned(
      spark: SparkSession, root: String,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      autoCompact: Boolean = true
  ): (String, Seq[graft.ops.GrowthPolicy.Action]) = {
    val committed = (d: String) => readMeta(spark, d).isDefined
    val cur = graft.ops.VersionedStore.current(spark, root, committed)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed exact catalog under versioned root $root"))
    // recommend first WITHOUT the in-place compaction: a grown store
    // typically trips Compact and Rebucket together, and the Rebucket
    // rewrite ([[rebucket]] collapses duplicates itself) supersedes a
    // compact of the predecessor it is about to retire — running both
    // would double the rewrite I/O of the growth event
    val acts = maintain(spark, cur, policy, autoCompact = false)
    val moved = acts.collectFirst {
      case graft.ops.GrowthPolicy.Rebucket(n, _) =>
        graft.ops.VersionedStore.cutover(spark, root, committed)(
          rebucket(spark, cur, _, n))
    }
    if (moved.isEmpty && autoCompact) acts.foreach {
      case graft.ops.GrowthPolicy.Compact(bs) =>
        compact(spark, cur, buckets = Some(bs))
      case _ => ()
    }
    moved.foreach(_ => graft.ops.VersionedStore.retire(spark, root, committed))
    (moved.getOrElse(cur), acts)
  }

  /** Rewrite each selected bucket as one fp-sorted file, collapsing
    * duplicate `(fp, h2)` rows to their LATEST `added` tag, optionally
    * dropping rows below `retainAddedFrom` (retention — the caller
    * decides what the tag means). `buckets = None` = full catalog (the
    * retention-sweep shape); `Some(…)` = only those buckets (the
    * steady-state hygiene shape — see [[BandedCatalog.compact]]).
    * Duplicate-tolerant swap, same as there. */
  def compact(
      spark: SparkSession, dir: String,
      retainAddedFrom: Option[Long] = None,
      buckets: Option[Seq[Int]] = None): Unit = {
    val f = fs(spark, dir)
    if (readMeta(spark, dir).isEmpty) return
    val inScope: Path => Boolean = buckets match {
      case None => _ => true
      case Some(bs) =>
        val names = bs.map(b => s"bucket=$b").toSet
        p => names.contains(p.getParent.getName)
    }
    val oldFiles = dataFiles(f, dir).filter(inScope)
    if (oldFiles.isEmpty) return
    val scoped = buckets match {
      case Some(bs) =>
        graft.ops.Listing.driverSide(spark) {
          spark.read.schema(DataSchema).parquet(dir)
        }.filter(col("bucket").isin(bs: _*))
      case None => graft.ops.Listing.driverSide(spark) {
        spark.read.schema(DataSchema).parquet(dir)
      }
    }
    val kept = retainAddedFrom match {
      case Some(cutoff) => scoped.filter(col("added") >= cutoff)
      case None => scoped
    }
    val tmp = s"$dir/_compacting"
    f.delete(new Path(tmp), true)
    kept
      .groupBy(col("bucket"), col("fp"), col("h2"))
      .agg(max(col("added")).as("added"))
      .select(col("fp"), col("h2"), col("added"), col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "fp") // see append(): bucket prefix
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val moved = scala.collection.mutable.ArrayBuffer.empty[graft.ops.Manifest.Entry]
    for (bucketDir <- f.listStatus(new Path(tmp)).toSeq
         if bucketDir.isDirectory && bucketDir.getPath.getName.startsWith("bucket=")) {
      val target = new Path(dir, bucketDir.getPath.getName)
      f.mkdirs(target)
      for (part <- f.listStatus(bucketDir.getPath).toSeq
           if part.isFile && part.getPath.getName.endsWith(".parquet")) {
        val dest = new Path(target, s"compacted-${part.getPath.getName}")
        // failed renames RETURN FALSE; deleting the inputs after one
        // would lose rows — abort, leaving harmless duplicates
        if (!f.rename(part.getPath, dest)) throw new java.io.IOException(
          s"catalog compaction: rename ${part.getPath} -> $dest failed; " +
            "old files left in place (duplicates only, no loss)")
        moved += graft.ops.Manifest.Entry(
          s"${target.getName}/${dest.getName}", part.getLen,
          part.getModificationTime)
      }
    }
    // manifest swap AFTER the moves, BEFORE the deletes (Manifest class
    // doc): no window ever has a manifest naming a missing file
    graft.ops.Manifest.replaceScope(spark, dir,
      oldFiles.map(graft.ops.Manifest.relPath).toSet, moved.toSeq)
    oldFiles.foreach(p => f.delete(p, false))
    f.delete(new Path(tmp), true)
  }
}

package graft.ops

/** Growth and maintenance policy for the persistent bucketed stores —
  * the exact-dedup catalog ([[graft.dedup.ExactCatalog]]), the banded
  * signature catalog ([[graft.dedup.BandedCatalog]]) and the IVF/IVF-PQ
  * index ([[graft.sim.IvfIndex]]). The stores expose mechanisms
  * (`rebucket`, per-bucket `compact`, rebuild); this object decides WHEN,
  * from their occupancy signals, so the decision thresholds live in one
  * documented, spec-pinned place instead of ad-hoc operator judgment.
  *
  * The policy is a PURE function of the signals — no filesystem access —
  * so the spec can pin that each action trips exactly at its documented
  * threshold and never before. Each store wraps it in a `maintain(...)`
  * helper that gathers its own signals and (flag-gated) auto-runs the
  * one action that is safe in place: per-bucket compaction. Re-sharding
  * and retraining build into a FRESH directory with a cutover: plain
  * `maintain` only RECOMMENDS those (caller-owned swap), while each
  * store's `maintainVersioned` EXECUTES them through
  * [[VersionedStore]] — readers resolve a committed version at every
  * instant, crash-mid-rebuild included.
  *
  * SCALE.md §growth runbook documents the operational procedure.
  */
object GrowthPolicy {

  /** Thresholds. Defaults target HDFS/S3-friendly file sizes: a bucket
    * (or IVF list) should stay around one well-sized parquet file.
    *
    * @param targetBucketBytes re-shard when the MEAN bytes per
    *   configured bucket exceeds this (empty buckets count — sizing is a
    *   property of the layout, and `bucket = key mod numBuckets` spreads
    *   a healthy keyspace near-uniformly, so a skewed mean means the
    *   bucket count is wrong, not the data)
    * @param maxFilesPerBucket compact a bucket when its parquet file
    *   count exceeds this (steady-state floor is 1 file per bucket; each
    *   micro-batch append adds at most one)
    * @param maxDriftRatio (IVF only) recommend retrain when the
    *   quantization error of incoming vectors exceeds this multiple of
    *   the build-time reference
    */
  case class Policy(
      targetBucketBytes: Long = 256L << 20,
      maxFilesPerBucket: Int = 8,
      maxDriftRatio: Double = 1.5)

  sealed trait Action

  /** Re-shard into `newBuckets` (always a fresh dir + cutover — never
    * run in place; `maintainVersioned` executes it through
    * [[VersionedStore]]. For the IVF index this is a RETRAIN under
    * `newBuckets` lists, since the list count is trained into the
    * quantizer). */
  case class Rebucket(newBuckets: Int, meanBucketBytes: Long) extends Action

  /** LSM-merge the listed buckets in place (safe to auto-run: the
    * stores' compact is a duplicate-tolerant swap). */
  case class Compact(buckets: Seq[Int]) extends Action

  /** (IVF) the coarse quantizer no longer fits the data — rebuild into a
    * fresh dir (never run in place; `IvfIndex.maintainVersioned`
    * executes it through [[VersionedStore]]). */
  case class Retrain(driftRatio: Double) extends Action

  /** One recursive listing of `root`, aggregating parquet
    * (fileCount, bytes) per partition id parsed from the
    * `prefix`-named parent directory — the shared occupancy-signal
    * walker behind every store's `bucketFileCounts`/`bucketByteSizes`/
    * `maintain`. One pass, lengths taken from the FileStatus the
    * listing already returned (a per-file getFileStatus re-fetch would
    * be O(files) extra metadata RPCs on object stores). */
  def partitionStats(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      prefix: String): Map[Int, (Int, Long)] = {
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val entries = fs.listStatus(p).toSeq
      entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")) ++
        entries.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
          .flatMap(s => walk(s.getPath))
    }
    val files = if (fs.exists(root)) walk(root) else Seq.empty
    files.flatMap { s =>
      val parent = s.getPath.getParent.getName
      if (parent.startsWith(prefix))
        Some((parent.stripPrefix(prefix).toInt, s.getLen))
      else None
    }.groupBy(_._1).map { case (b, xs) => (b, (xs.size, xs.map(_._2).sum)) }
  }

  /** The decision. Trips EXACTLY at the thresholds:
    *  - [[Rebucket]] when `Σ bytes > targetBucketBytes × numBuckets`
    *    (i.e. the mean configured-bucket size strictly exceeds the
    *    target); the new count doubles `numBuckets` until the mean fits
    *    (doubling keeps re-shards rare — O(log growth) of them over a
    *    store's lifetime);
    *  - [[Compact]] for every bucket whose file count strictly exceeds
    *    `maxFilesPerBucket`;
    *  - [[Retrain]] when the supplied drift ratio strictly exceeds
    *    `maxDriftRatio`.
    * An empty result means healthy. Multiple actions can co-trip (a
    * store can be both over-sized and fragmented); [[Rebucket]] leads
    * because a re-shard also collapses fragmentation, making the
    * compaction moot if the operator acts on it first. */
  def recommend(
      numBuckets: Int,
      bucketBytes: Map[Int, Long],
      bucketFiles: Map[Int, Int],
      policy: Policy = Policy(),
      driftRatio: Option[Double] = None): Seq[Action] = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    // a zero/negative target would make the doubling loop spin until n
    // overflows negative and never terminates
    require(policy.targetBucketBytes > 0,
      s"targetBucketBytes must be positive: ${policy.targetBucketBytes}")
    require(policy.maxFilesPerBucket > 0,
      s"maxFilesPerBucket must be positive: ${policy.maxFilesPerBucket}")
    val total = bucketBytes.values.sum
    // overflow-safe sizing: `needed` is computed by DIVISION (a
    // target × count product can overflow Long at petabyte totals, and
    // an Int doubling loop would wrap negative and spin forever); the
    // count doubles in a Long and caps at Int.MaxValue (bucket ids are
    // Ints — a store needing more has outgrown this layout entirely)
    val needed = (total + policy.targetBucketBytes - 1) / policy.targetBucketBytes
    // ceil(total/target) > numBuckets ⟺ total > target × numBuckets —
    // the same strict threshold, stated without the product
    val rebucket =
      if (needed > numBuckets) {
        var n = numBuckets.toLong
        while (n < needed && n < Int.MaxValue) n *= 2
        Seq(Rebucket(math.min(n, Int.MaxValue).toInt, total / numBuckets))
      } else Seq.empty
    val over = bucketFiles.filter(_._2 > policy.maxFilesPerBucket)
      .keys.toSeq.sorted
    val compact = if (over.nonEmpty) Seq(Compact(over)) else Seq.empty
    val retrain = driftRatio.filter(_ > policy.maxDriftRatio)
      .map(Retrain(_)).toSeq
    rebucket ++ compact ++ retrain
  }
}

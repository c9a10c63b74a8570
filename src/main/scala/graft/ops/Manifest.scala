package graft.ops

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** FILE MANIFESTS for the bucket-partitioned catalogs (r18, guide §6 —
  * "table formats with manifest metadata avoid directory listing
  * altogether, one of the strongest practical arguments for them at
  * scale"): one `_graft_manifest` file per catalog dir records every
  * data file's relative path, exact length and mtime, maintained at
  * append/compact/rebucket time. Probe reads build their relation from
  * the manifest through a [[FileIndex]] whose statuses come straight
  * from the recorded entries — ZERO filesystem listing calls on the
  * read path (the r17 `Listing.driverSide` move removed the listing
  * JOB; this removes the listing itself, which on an object store was
  * still one LIST per probed bucket dir, and makes the
  * `SPARK_GRAFT_LIST_PARALLEL_THRESHOLD` crossover moot wherever a
  * manifest exists).
  *
  * Crash contract (single writer per catalog dir — the operators'
  * existing model; appends/compactions of ONE catalog never race):
  *
  *  - **append**: data files land first (Spark's committer), the
  *    manifest gains their entries after. A crash between the two
  *    leaves ORPHANS — committed files no manifest lists. To manifest
  *    readers that append never happened, which is exactly the
  *    pre-append crash state of the family contract: the batch is
  *    replayed (delivery preceded the append), the replay re-appends
  *    equivalent rows AND the manifest entry. Orphans persist as
  *    invisible duplicate rows until the next COMPACT, whose read is
  *    deliberately listing-based (it walks real files), folds them into
  *    the merged output, and rebuilds the manifest — the sweep.
  *  - **compact**: merged files move in, THEN the manifest swaps to
  *    (out-of-scope entries ∪ merged entries), THEN the old files are
  *    deleted. A crash before the swap leaves the old manifest naming
  *    old files (still present); after the swap, the new manifest names
  *    only present files and the undeleted old ones are orphans for the
  *    next sweep. At no point does a manifest name a missing file.
  *  - **rebucket**: fresh dir — data, manifest, then meta (the commit
  *    marker stays last).
  *  - **no manifest** (pre-manifest catalog, torn manifest write):
  *    readers fall back to directory listing — the pre-r18 behavior —
  *    and the next append heals by building the manifest from a walk.
  *
  * The swap itself is tmp + rename. On a store without atomic rename
  * the worst case is a missing/torn manifest, which the version header
  * check turns into the listing fallback — never a wrong file set.
  * `SPARK_GRAFT_MANIFEST=0` disables both sides (A/B and escape hatch).
  */
object Manifest {

  /** One data file: dir-relative path (`bucket=N/part-….parquet`),
    * exact byte length (the parquet footer offset — must be right),
    * modification time. */
  final case class Entry(path: String, size: Long, mtime: Long)

  private val FileName = "_graft_manifest"
  private val Header = "graft-manifest v1"

  private val Enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_MANIFEST", "1") != "0"

  /** Whether manifest maintenance is on (writers skip their bookkeeping
    * — and the Observation node — when it is not). */
  def enabled: Boolean = Enabled

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------ read

  /** The manifest's entries; None = no (or torn) manifest → callers
    * fall back to listing. */
  def read(spark: SparkSession, dir: String): Option[Seq[Entry]] = {
    if (!Enabled) return None
    val f = fs(spark, dir)
    val p = new Path(dir, FileName)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.split("\n").iterator.filter(_.nonEmpty).toSeq
      if (lines.isEmpty || lines.head != Header) None // torn/foreign: fallback
      else Some(lines.tail.map { l =>
        val Array(size, mtime, path) = l.split("\t", 3)
        Entry(path, size.toLong, mtime.toLong)
      })
    }
  }

  // ----------------------------------------------------------- write

  private def writeEntries(
      f: FileSystem, dir: String, entries: Seq[Entry]): Unit = {
    val tmp = new Path(dir, FileName + ".tmp")
    val target = new Path(dir, FileName)
    val out = f.create(tmp, true)
    try {
      val sb = new StringBuilder(Header).append('\n')
      entries.foreach(e =>
        sb.append(e.size).append('\t').append(e.mtime).append('\t')
          .append(e.path).append('\n'))
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    // rename-over works atomically on POSIX; where it refuses, delete
    // then rename — the uncovered window leaves NO manifest, which is
    // the (correct) listing fallback, never a wrong file set
    if (!f.rename(tmp, target)) {
      f.delete(target, false)
      if (!f.rename(tmp, target)) f.delete(tmp, false)
    }
  }

  private def walkEntries(f: FileSystem, dir: String): Seq[Entry] = {
    val root = new Path(dir)
    def walk(p: Path, prefix: String): Seq[Entry] = {
      val entries = f.listStatus(p).toSeq
      entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => Entry(prefix + s.getPath.getName, s.getLen,
          s.getModificationTime)) ++
        entries.filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
          .flatMap(s => walk(s.getPath, prefix + s.getPath.getName + "/"))
    }
    if (f.exists(root)) walk(root, "") else Seq.empty
  }

  /** Rebuild from a full walk — creation, healing, and [[rebucket]]'s
    * fresh-dir case. */
  def rebuild(spark: SparkSession, dir: String): Unit = if (Enabled) {
    val f = fs(spark, dir)
    writeEntries(f, dir, walkEntries(f, dir))
  }

  /** Record an append: list ONLY the touched buckets' dirs and fold
    * files the manifest does not know yet. A manifest-less catalog is
    * healed with a one-time full rebuild. */
  def recordAppend(
      spark: SparkSession, dir: String, touchedBuckets: Iterable[Int]): Unit =
    if (Enabled) {
      val f = fs(spark, dir)
      read(spark, dir) match {
        case None => rebuild(spark, dir)
        case Some(cur) =>
          val known = cur.map(_.path).toSet
          val fresh = touchedBuckets.toSeq.distinct.flatMap { b =>
            val bd = new Path(dir, s"bucket=$b")
            if (!f.exists(bd)) Nil
            else f.listStatus(bd).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .map(s => Entry(s"bucket=$b/${s.getPath.getName}", s.getLen,
                s.getModificationTime))
              .filterNot(e => known(e.path))
          }
          if (fresh.nonEmpty) writeEntries(f, dir, cur ++ fresh)
      }
    }

  /** Compaction swap: drop `removed` (relative paths), add the merged
    * files' entries. Called AFTER the merged files moved in and BEFORE
    * the old files are deleted (class-doc crash windows). A
    * manifest-less catalog stays manifest-less here (the next append
    * heals it) — rebuilding before the deletes would name files the
    * deletes are about to remove. */
  def replaceScope(
      spark: SparkSession, dir: String, removed: Set[String],
      added: Seq[Entry]): Unit = if (Enabled) {
    read(spark, dir).foreach { cur =>
      writeEntries(fs(spark, dir), dir,
        cur.filterNot(e => removed(e.path)) ++ added)
    }
  }

  /** Relative path of a data file under `dir` (bucket-layout files sit
    * exactly one partition dir deep). */
  def relPath(p: Path): String = s"${p.getParent.getName}/${p.getName}"

  // -------------------------------------------------------- relation

  private val BucketRe = "bucket=(\\d+)/.*".r

  /** The manifest-backed relation over `buckets` — None when the dir
    * has no manifest (callers fall back to their listing path). The
    * returned frame's rows and schema are IDENTICAL to the listing
    * relation over the same buckets; only the file discovery differs
    * (recorded statuses instead of listStatus calls). */
  def relation(
      spark: SparkSession, dir: String, buckets: Seq[Int],
      schema: StructType): Option[DataFrame] =
    read(spark, dir).map { entries =>
      val sel = buckets.toSet
      val byBucket = entries.flatMap { e =>
        e.path match {
          case BucketRe(b) if sel(b.toInt) => Some((b.toInt, e))
          case _ => None
        }
      }.groupBy(_._1).map { case (b, es) => (b, es.map(_._2)) }
      val partitionSchema = StructType(schema.filter(_.name == "bucket"))
      val dataSchema = StructType(schema.filterNot(_.name == "bucket"))
      val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      if (byBucket.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val f = fs(spark, dir)
        val base = f.makeQualified(new Path(dir))
        val index = new ManifestFileIndex(base, byBucket, partitionSchema)
        session.baseRelationToDataFrame(HadoopFsRelation(
          index, partitionSchema, dataSchema, None, new ParquetFileFormat(),
          Map.empty)(session))
      }
    }

  /** [[FileIndex]] over recorded statuses: every `FileStatus` is built
    * from the manifest entry (exact length — the parquet reader seeks
    * the footer from it), so constructing and scanning the relation
    * performs no listing or per-file status calls at all. Partition
    * filters are honored the way `InMemoryFileIndex` does (bind by
    * partition-column name, evaluate per directory) in case a caller
    * filters on `bucket` above a manifest relation. */
  private final class ManifestFileIndex(
      base: Path, byBucket: Map[Int, Seq[Entry]],
      override val partitionSchema: StructType) extends FileIndex {

    override def rootPaths: Seq[Path] = Seq(base)

    override def listFiles(
        partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val dirs = byBucket.toSeq.map { case (b, es) =>
        (InternalRow(b), es.map(e => new FileStatus(
          e.size, false, 1, 128L * 1024 * 1024, e.mtime,
          new Path(base, e.path))).toArray)
      }
      val pruned =
        if (partitionFilters.isEmpty) dirs
        else {
          val bound = partitionFilters.map(_.transform {
            case a: AttributeReference =>
              val i = partitionSchema.indexWhere(_.name == a.name)
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
          val pred = Predicate.createInterpreted(bound.reduce(And))
          dirs.filter { case (row, _) => pred.eval(row) }
        }
      pruned.map { case (row, files) => PartitionDirectory(row, files) }
    }

    override def inputFiles: Array[String] =
      byBucket.values.flatten.map(e => new Path(base, e.path).toString).toArray

    override def refresh(): Unit = ()

    override def sizeInBytes: Long = byBucket.values.flatten.map(_.size).sum
  }
}

package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The fresh-dir CUTOVER the [[GrowthPolicy]] recommend-only actions
  * (`Rebucket`, `Retrain`) describe — shipped, so operators stop
  * hand-rolling the swap each store's scaladoc prescribes.
  *
  * Layout: a store root holds VERSION directories `v1, v2, …`; the
  * serving version is the HIGHEST one whose store has COMMITTED. There
  * is deliberately no pointer file: every graft store already writes a
  * commit marker LAST ([[graft.sim.IvfIndex]] meta,
  * [[graft.dedup.ExactCatalog]]/[[graft.dedup.BandedCatalog]] meta +
  * data), and resolving off that marker makes the cutover safe on
  * object stores where rename is neither atomic nor cheap — a pointer
  * file would need exactly the atomic overwrite S3 doesn't give.
  *
  * Crash contract, by construction:
  *  - crash MID-BUILD: the new `v(n+1)` exists but never committed →
  *    [[current]] still resolves `v(n)`; readers never see the partial
  *    build. The abandoned dir is swept by the next [[retire]].
  *  - crash AFTER the build, BEFORE retirement: both versions are
  *    committed → [[current]] resolves the new one (highest wins); the
  *    old keeps its data until [[retire]] — at worst extra disk, never
  *    a correctness window.
  *
  * Single-writer discipline (the same one every store's append already
  * assumes): one operator runs cutover/retire at a time.
  */
object VersionedStore {

  private val VersionRe = "^v(\\d+)$".r

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All version numbers present under `root` (committed or not). */
  private def versions(f: FileSystem, root: String): Seq[Int] = {
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(s => VersionRe.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toInt))
      .sorted
  }

  def versionDir(root: String, n: Int): String = s"$root/v$n"

  /** The serving directory: the highest version whose `isCommitted`
    * probe passes (each store's reader-side meta check — e.g.
    * `IvfIndex.readMeta(spark, _).isDefined`). None on an empty or
    * all-crashed root. */
  def current(
      spark: SparkSession, root: String,
      isCommitted: String => Boolean): Option[String] = {
    val f = fs(spark, root)
    versions(f, root).reverse.iterator
      .map(versionDir(root, _))
      .find(isCommitted)
  }

  /** Run one cutover: `build` populates the NEXT version directory
    * (fresh — numbered past every existing version, crashed remnants
    * included) and must finish with the store's own commit marker, the
    * same contract as the stores' `build()`. Returns the new serving
    * dir. If `build` throws, the partial version is left uncommitted
    * (readers unaffected) and the exception propagates. */
  def cutover(
      spark: SparkSession, root: String,
      isCommitted: String => Boolean)(build: String => Unit): String = {
    val f = fs(spark, root)
    val next = versions(f, root).lastOption.getOrElse(0) + 1
    val dir = versionDir(root, next)
    build(dir)
    require(isCommitted(dir),
      s"cutover build into $dir returned without committing " +
        "(no store meta) — refusing to treat it as serving")
    dir
  }

  /** Retire every version BELOW the serving one — committed
    * predecessors and crashed-build remnants alike. Never touches the
    * serving version or anything above it (a concurrent in-progress
    * build is always the highest number). No-op when nothing serves. */
  def retire(
      spark: SparkSession, root: String,
      isCommitted: String => Boolean): Seq[String] = {
    val f = fs(spark, root)
    current(spark, root, isCommitted) match {
      case None => Seq.empty
      case Some(cur) =>
        val curN = VersionRe.findFirstMatchIn(new Path(cur).getName)
          .get.group(1).toInt
        versions(f, root).filter(_ < curN).map { n =>
          val d = versionDir(root, n)
          f.delete(new Path(d), true)
          d
        }
    }
  }
}

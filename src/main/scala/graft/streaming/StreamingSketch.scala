package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** The PERSISTENT count-min sketch accumulator — the first streaming
  * statistics surface (r11 verdict item 8): heavy-hitter counts carried
  * across micro-batches. Per trigger the batch folds to its own ~100 KB
  * sketch with Spark's map-side-mergeable `count_min_sketch` aggregate
  * (one pass, no gram shuffle — at 100 TB the exact gram groupBy is the
  * thing you cannot afford), the driver merges it into the persisted
  * sketch (CMS counters are sums, so merge-of-sketches IS the sketch of
  * the concatenation, exactly), and the result lands with an atomic
  * tmp+rename swap.
  *
  * Layout properties (the catalog layout discipline): `eps`,
  * `confidence` and `seed` define the counter geometry and hashing —
  * merging sketches of different geometry is meaningless, so they are
  * recorded at creation and AUTHORITATIVE from then on: later calls'
  * geometry arguments are create-time defaults only (the family
  * convention — every batch folds under the meta's geometry, so a
  * divergent caller cannot corrupt the merge, only be ignored).
  *
  * Replay contract: the file carries `lastAdded`; a batch whose `added`
  * tag is not strictly greater is a NO-OP (foreachBatch batch ids are
  * monotone, so an at-least-once replay merges at most once — the
  * estimate guarantee `true <= est <= true + eps*N` keeps referring to
  * the once-merged stream). Merge-after-delivery position as everywhere:
  * the accumulator is a statistics surface, never a delivery gate.
  */
object StreamingSketch {

  val DefaultEps = 0.001
  val DefaultConfidence = 0.99
  val DefaultSeed = 42

  final case class Meta(eps: Double, confidence: Double, seed: Int, lastAdded: Long)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def sketchPath(dir: String) = new Path(dir, "cms.bin")

  /** One file holds meta + counters so the swap is atomic as a unit:
    * 4-byte big-endian meta length, meta JSON, then the CMS's own
    * serialization. */
  private def writeAll(f: FileSystem, dir: String, m: Meta, sk: CountMinSketch): Unit = {
    val tmp = new Path(dir, "_cms.tmp")
    val out = f.create(tmp, true)
    try {
      val metaBytes =
        s"""{"eps":${m.eps},"confidence":${m.confidence},"seed":${m.seed},"lastAdded":${m.lastAdded}}"""
          .getBytes(StandardCharsets.UTF_8)
      out.writeInt(metaBytes.length)
      out.write(metaBytes)
      sk.writeTo(out)
    } finally out.close()
    if (!f.rename(tmp, sketchPath(dir))) {
      // HDFS rename won't overwrite; delete-then-rename leaves at worst
      // a missing-current window a reader treats as empty — acceptable
      // for a statistics surface, unlike the dedup catalogs
      f.delete(sketchPath(dir), false)
      if (!f.rename(tmp, sketchPath(dir)))
        throw new java.io.IOException(s"sketch swap failed at $dir")
    }
  }

  def readAll(spark: SparkSession, dir: String): Option[(Meta, CountMinSketch)] = {
    val f = fs(spark, dir)
    val p = sketchPath(dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val len = in.readInt()
        val metaBytes = new Array[Byte](len)
        in.readFully(metaBytes)
        val text = new String(metaBytes, StandardCharsets.UTF_8)
        def num(name: String): String =
          s""""$name":([-0-9.eE]+)""".r.findFirstMatchIn(text).map(_.group(1))
            .getOrElse(throw new IllegalStateException(
              s"sketch meta at $p is missing '$name': $text"))
        val m = Meta(num("eps").toDouble, num("confidence").toDouble,
          num("seed").toInt, num("lastAdded").toLong)
        Some((m, CountMinSketch.readFrom(in)))
      } finally in.close()
    }
  }

  /** The current sketch (None before the first merge). */
  def read(spark: SparkSession, dir: String): Option[CountMinSketch] =
    readAll(spark, dir).map(_._2)

  /** Point estimate for `item` against the persisted sketch (0 before
    * the first merge — an empty stream has counted nothing). */
  def estimate(spark: SparkSession, dir: String, item: String): Long =
    read(spark, dir).map(_.estimateCount(item)).getOrElse(0L)

  /** Merge one micro-batch's items into the persisted sketch. `items`
    * must be a single string column (explode grams upstream). Geometry
    * parameters are CREATE-TIME defaults — an existing sketch's meta is
    * authoritative and divergent arguments are ignored (see class doc).
    * Returns the merged sketch (or the current one for a replayed
    * no-op batch). */
  def applyBatch(
      items: DataFrame, dir: String, added: Long,
      eps: Double = DefaultEps, confidence: Double = DefaultConfidence,
      seed: Int = DefaultSeed): CountMinSketch = {
    val spark = items.sparkSession
    val col0 = items.columns.headOption.getOrElse(
      throw new IllegalArgumentException("items frame has no columns"))
    // family convention: an existing store's meta is AUTHORITATIVE and
    // the passed geometry is a create-time default only — the batch
    // sketch below is computed under the meta's geometry, so a caller
    // passing different values can never corrupt the merge
    val existing = readAll(spark, dir)
    val (meta, current) = existing.getOrElse(
      (Meta(eps, confidence, seed, Long.MinValue),
        CountMinSketch.create(eps, confidence, seed)))
    if (added <= meta.lastAdded) return current // replay: merge at most once
    // geometry from the META (create-time args only bootstrap); the
    // column name is backtick-quoted — an unquoted splice would parse
    // names like `n-gram` as arithmetic
    val quoted = "`" + col0.replace("`", "``") + "`"
    // pinned 1-row aggregate: negligible cost, and the plan census sees
    // the map-side sketch fold (the ngram_cms gate's discipline)
    val skBytes = graft.ops.Checkpoints.pin(items
      .agg(expr(s"count_min_sketch($quoted, ${meta.eps}d, ${meta.confidence}d, " +
        s"${meta.seed})").as("sk")))
      .head.getAs[Array[Byte]](0)
    val batchSketch = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    current.mergeInPlace(batchSketch)
    writeAll(fs(spark, dir), dir, meta.copy(lastAdded = added), current)
    current
  }

  /** Column helper: the word n-grams of `textCol` as the item stream the
    * heavy-hitter sketch counts (the `ngram_cms` shape). */
  def wordNgramItems(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val grams = when(
      graft.functions.GraftFunctions.tokenCountWs(col(textCol)) < n,
      array().cast("array<string>"))
      .otherwise(graft.functions.GraftFunctions
        .wordNgrams(col(textCol), n, distinct = false))
    df.select(explode(grams).as("gram"))
  }
}

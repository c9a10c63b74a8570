package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}

/** The PERSISTENT HLL distinct-count accumulator — the second streaming
  * statistics surface next to the heavy-hitter [[StreamingSketch]]:
  * "how many distinct tokens / urls / fingerprints has this stream ever
  * carried" answered in ~KBs of state, across micro-batches, forever.
  * Per trigger the batch folds map-side to its own sketch with Spark's
  * `hll_sketch_agg` (one pass, no distinct shuffle — at 100 TB the
  * exact global `countDistinct` is the thing you cannot afford), the
  * driver unions it into the persisted sketch, and the result lands
  * with the same atomic tmp+rename swap as the CMS accumulator.
  *
  * What the union guarantees — and what it deliberately does not: the
  * merged estimate carries HLL's relative-error bound on the distinct
  * count of everything merged (±~1.6% at the default lgK 12, 1σ), and
  * a FIXED batch sequence merges fully deterministically (no RNG —
  * replays and re-runs are byte-identical, pinned by spec). It is NOT
  * the bit-identical state a single-pass sketch of the concatenated
  * stream would hold: DataSketches unions go through a coupon/HLL-mode
  * gadget and the composite estimator, so two different BATCHINGS of
  * the same stream can differ in the estimate's low-order digits
  * (measured ~0.7% apart at 600 items; both inside the bound — the
  * spec pins the bound, not a false identity; contrast
  * [[StreamingSketch]], whose CMS counters merge exactly).
  *
  * Layout property: `lgK` defines the register geometry — recorded at
  * creation, AUTHORITATIVE from then on (the family convention; every
  * batch folds under the meta's lgK so a divergent caller cannot skew
  * the union, only be ignored).
  *
  * Replay contract: `lastAdded` tag, merge at most once — identical to
  * [[StreamingSketch]]. Union-after-delivery position as everywhere: a
  * statistics surface, never a delivery gate. (Idempotence here is
  * belt-and-braces: HLL union is idempotent in the items themselves, so
  * even a double merge cannot skew the estimate — the tag keeps the
  * accumulator's "batches seen" bookkeeping truthful.)
  */
object StreamingDistinct {

  val DefaultLgK = 12

  final case class Meta(lgK: Int, lastAdded: Long)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def sketchPath(dir: String) = new Path(dir, "hll.bin")

  /** One file holds meta + sketch so the swap is atomic as a unit (the
    * [[StreamingSketch.readAll]] framing): 4-byte BE meta length, meta
    * JSON, then the sketch's updatable serialization. */
  private def writeAll(f: FileSystem, dir: String, m: Meta, sk: HllSketch): Unit = {
    val tmp = new Path(dir, "_hll.tmp")
    val out = f.create(tmp, true)
    try {
      val metaBytes = s"""{"lgK":${m.lgK},"lastAdded":${m.lastAdded}}"""
        .getBytes(StandardCharsets.UTF_8)
      out.writeInt(metaBytes.length)
      out.write(metaBytes)
      out.write(sk.toUpdatableByteArray)
    } finally out.close()
    if (!f.rename(tmp, sketchPath(dir))) {
      f.delete(sketchPath(dir), false)
      if (!f.rename(tmp, sketchPath(dir)))
        throw new java.io.IOException(s"hll swap failed at $dir")
    }
  }

  def readAll(spark: SparkSession, dir: String): Option[(Meta, HllSketch)] = {
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
        def num(name: String): Long =
          s""""$name":(-?\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong)
            .getOrElse(throw new IllegalStateException(
              s"hll meta at $p is missing '$name': $text"))
        val m = Meta(num("lgK").toInt, num("lastAdded"))
        val rest = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var r = in.read(buf)
        while (r >= 0) { rest.write(buf, 0, r); r = in.read(buf) }
        Some((m, HllSketch.heapify(rest.toByteArray)))
      } finally in.close()
    }
  }

  /** Distinct-count estimate of everything the stream has carried (0.0
    * before the first merge). */
  def estimate(spark: SparkSession, dir: String): Double =
    readAll(spark, dir).map(_._2.getEstimate).getOrElse(0.0)

  /** Union one micro-batch's items into the persisted sketch. `items`
    * must be a single column (any hashable type — strings, longs,
    * binary fingerprints). `lgK` is a CREATE-TIME default; an existing
    * sketch's meta is authoritative. Returns the merged sketch (or the
    * current one for a replayed no-op batch). */
  def applyBatch(
      items: DataFrame, dir: String, added: Long,
      lgK: Int = DefaultLgK): HllSketch = {
    val spark = items.sparkSession
    val col0 = items.columns.headOption.getOrElse(
      throw new IllegalArgumentException("items frame has no columns"))
    val existing = readAll(spark, dir)
    val (meta, current) = existing.getOrElse(
      (Meta(lgK, Long.MinValue), new HllSketch(lgK)))
    if (added <= meta.lastAdded) return current // replay: merge at most once
    val quoted = "`" + col0.replace("`", "``") + "`"
    // pinned 1-row aggregate: negligible cost, and the plan census sees
    // the map-side sketch fold (the ngram_cms gate's discipline)
    val skBytes = graft.ops.Checkpoints.pin(items
      .agg(expr(s"hll_sketch_agg($quoted, ${meta.lgK})").as("sk")))
      .head.getAs[Array[Byte]](0)
    val merged =
      if (skBytes == null) current // an all-null/empty batch adds nothing
      else {
        val u = new Union(meta.lgK)
        u.update(current)
        u.update(HllSketch.heapify(skBytes))
        // HLL_8 is what hll_sketch_agg folds in and what keeps the
        // merged state identical to a single whole-stream sketch's
        u.getResult(TgtHllType.HLL_8)
      }
    writeAll(fs(spark, dir), dir, meta.copy(lastAdded = added), merged)
    merged
  }

  /** Column helper: the whitespace tokens of `textCol` as the item
    * stream (the vocabulary-growth shape). */
  def tokenItems(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
      graft.functions.GraftFunctions.tokenizeWs(col(textCol))).as("token"))
}

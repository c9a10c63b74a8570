package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTENT log-binned histogram accumulator — the quantile leg
  * of the streaming statistics family ([[StreamingSketch]] heavy-hitter
  * counts, [[StreamingDistinct]] distinct counts): "what is the p99 doc
  * length this stream has ever seen" answered from ~8 KB of state,
  * across micro-batches, forever. Per trigger the batch folds map-side
  * to ≤ `maxBins` `(bin, count)` rows (one tiny combine-heavy shuffle —
  * at 100 TB the exact global sort a true quantile needs is the thing
  * you cannot afford per report), the driver adds them into the
  * persisted counts vector, and the result lands with the family's
  * atomic tmp+rename swap.
  *
  * Why a HISTOGRAM and not a KLL/t-digest sketch: DataSketches' KLL
  * compaction draws unseedable random bits, so merged quantile
  * estimates are not reproducible — unusable for an exact oracle
  * contract and awkward for a regression gate. Log-spaced bins
  * (HdrHistogram's trade, log1p so 0 lands in bin 0) make everything
  * DETERMINISTIC and the merge EXACT: counts are sums, so
  * merge-of-batches IS the histogram of the concatenation, byte for
  * byte (the CMS argument), and a quantile query returns a BRACKET
  * [bin lower, bin upper] guaranteed to contain the true quantile —
  * with relative width e^(1/binsPerLn) − 1 (~6.5% at the default 16),
  * a bound that is a property of the bins, not of the data.
  *
  * Domain: non-negative values (lengths, counts, latencies); negatives
  * clamp to bin 0 and nulls are ignored. Layout properties
  * (`binsPerLn`, `maxBins`) are recorded at creation and authoritative
  * from then on; `lastAdded` makes at-least-once replays merge at most
  * once — the family contract throughout.
  */
object StreamingHistogram {

  val DefaultBinsPerLn = 16
  val DefaultMaxBins = 1024 // covers values up to e^64 ≈ 6e27

  final case class Meta(binsPerLn: Int, maxBins: Int, lastAdded: Long)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def histPath(dir: String) = new Path(dir, "hist.bin")

  def binOf(v: Column, binsPerLn: Int = DefaultBinsPerLn,
      maxBins: Int = DefaultMaxBins): Column =
    least(floor(log1p(greatest(v.cast("double"), lit(0.0))) * binsPerLn)
      .cast("int"), lit(maxBins - 1))

  /** Inclusive lower / exclusive upper value edge of bin `b`. */
  def binLower(b: Int, binsPerLn: Int = DefaultBinsPerLn): Double =
    math.expm1(b.toDouble / binsPerLn)
  def binUpper(b: Int, binsPerLn: Int = DefaultBinsPerLn): Double =
    math.expm1((b + 1).toDouble / binsPerLn)

  /** One file holds meta + the counts vector (same framing as the CMS
    * store): 4-byte BE meta length, meta JSON, then maxBins BE longs. */
  private def writeAll(f: FileSystem, dir: String, m: Meta,
      counts: Array[Long]): Unit = {
    val tmp = new Path(dir, "_hist.tmp")
    val out = f.create(tmp, true)
    try {
      val metaBytes =
        s"""{"binsPerLn":${m.binsPerLn},"maxBins":${m.maxBins},"lastAdded":${m.lastAdded}}"""
          .getBytes(StandardCharsets.UTF_8)
      out.writeInt(metaBytes.length)
      out.write(metaBytes)
      counts.foreach(out.writeLong)
    } finally out.close()
    if (!f.rename(tmp, histPath(dir))) {
      f.delete(histPath(dir), false)
      if (!f.rename(tmp, histPath(dir)))
        throw new java.io.IOException(s"histogram swap failed at $dir")
    }
  }

  def readAll(spark: SparkSession, dir: String): Option[(Meta, Array[Long])] = {
    val f = fs(spark, dir)
    val p = histPath(dir)
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
              s"histogram meta at $p is missing '$name': $text"))
        val m = Meta(num("binsPerLn").toInt, num("maxBins").toInt,
          num("lastAdded"))
        val counts = Array.fill(m.maxBins)(in.readLong())
        Some((m, counts))
      } finally in.close()
    }
  }

  /** Fold one micro-batch's values into the persisted histogram.
    * `items` must be a single numeric column; nulls are ignored. Layout
    * parameters are CREATE-TIME defaults — an existing store's meta is
    * authoritative. Returns the merged counts (or the current ones for
    * a replayed no-op batch). */
  def applyBatch(
      items: DataFrame, dir: String, added: Long,
      binsPerLn: Int = DefaultBinsPerLn,
      maxBins: Int = DefaultMaxBins): Array[Long] = {
    val spark = items.sparkSession
    val col0 = items.columns.headOption.getOrElse(
      throw new IllegalArgumentException("items frame has no columns"))
    val existing = readAll(spark, dir)
    val (meta, current) = existing.getOrElse(
      (Meta(binsPerLn, maxBins, Long.MinValue), Array.fill(maxBins)(0L)))
    if (added <= meta.lastAdded) return current // replay: merge at most once
    // pinned ≤ maxBins-row aggregate: negligible cost, and the plan
    // census sees the map-side binned fold (the ngram_cms discipline)
    val batchCounts = graft.ops.Checkpoints.pin(items
      .filter(col(col0).isNotNull)
      .groupBy(binOf(col(col0), meta.binsPerLn, meta.maxBins).as("bin"))
      .agg(count(lit(1)).as("n")))
      .collect() // ≤ maxBins rows, map-side combined — bounded by design
    val merged = current.clone()
    batchCounts.foreach(r => merged(r.getInt(0)) += r.getLong(1))
    writeAll(fs(spark, dir), dir, meta.copy(lastAdded = added), merged)
    merged
  }

  /** Total count folded so far (0 before the first merge). */
  def totalCount(spark: SparkSession, dir: String): Long =
    readAll(spark, dir).map(_._2.sum).getOrElse(0L)

  /** The value BRACKET `[lo, hi)` guaranteed to contain the q-quantile
    * (rank `ceil(q·n)`, the discrete definition) of everything folded —
    * the smallest bin whose cumulative count reaches the rank. None on
    * an empty histogram. */
  def quantileBracket(spark: SparkSession, dir: String,
      q: Double): Option[(Double, Double)] = {
    require(q > 0.0 && q <= 1.0, s"quantile out of (0, 1]: $q")
    readAll(spark, dir).flatMap { case (m, counts) =>
      val n = counts.sum
      if (n == 0L) None
      else {
        val rank = math.ceil(q * n).toLong
        var cum = 0L
        var b = 0
        while (b < m.maxBins && cum + counts(b) < rank) { cum += counts(b); b += 1 }
        Some((binLower(b, m.binsPerLn), binUpper(b, m.binsPerLn)))
      }
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Crawl-archive (WARC/WET) scan — the front door of a training-data
  * pipeline. Everything downstream of here is the existing curation
  * surface (`Html.extractText`, quality filters, the dedup tiers,
  * `StreamingCurate`); this module only turns segment FILES into a
  * records DataFrame.
  *
  * Scan shape, stated for the 100 TB case: a gzipped WARC segment is
  * NON-SPLITTABLE (concatenated gzip members), so the parallel unit is
  * the FILE — exactly how the published crawls are laid out (tens of
  * thousands of ~1 GB segments per crawl; Spark schedules one segment
  * per task, and a 1000-executor cluster is saturated by any real
  * crawl's segment count, not by intra-file parallelism). The
  * `binaryFile` source carries each file as one row (content bytes +
  * path), the `warc_records` kernel explodes it into records in one
  * codegen'd byte walk, and everything after the explode is ordinary
  * narrow projection. Per-task memory = one segment, inflated —
  * bounded by crawl convention (segments are sized ~1 GB precisely so
  * readers can hold one), and the 2 GB `binaryFile` row cap matches
  * that convention. Pathological single files beyond that belong to a
  * re-segmentation job, not this scan.
  *
  * `pathGlobFilter`/partition pruning: pass a glob (e.g.
  * `.../segments/&#42;/wet/&#42;.warc.wet.gz`) — file listing prunes
  * driver-side exactly like any file source. */
object Warc {

  /** The fixed binaryFile source schema (needed explicitly for the
    * STREAMING reader — file stream sources take no inference pass). */
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** One (path, content) row per segment file → records. Shared by the
    * batch and streaming readers — the parse is a pure projection, so
    * the streaming plan is the batch plan under a file-stream scan. */
  private def recordsOf(files: DataFrame): DataFrame =
    files
      .select(col("path"), GraftFunctions.warcRecords(col("content")).as("__recs"))
      // explode_outer keeps REFUSED files (null array) as one
      // null-fielded row each; a legitimately EMPTY file (zero records,
      // which the kernel parses to an empty array, NOT a refusal) is
      // dropped entirely — explode_outer alone would emit a null row
      // for it too and the corrupt-segment count would overstate
      .filter(col("__recs").isNull || size(col("__recs")) > 0)
      .select(col("path"), explode_outer(col("__recs")).as("__r"))
      .select(col("path"),
        col("__r.rec_type").as("rec_type"),
        col("__r.url").as("url"),
        col("__r.date").as("date"),
        col("__r.content_type").as("content_type"),
        col("__r.block").as("block"))

  /** All records of every WARC/WET file under `path` (glob ok):
    * `(path, rec_type, url, date, content_type, block)`. A malformed
    * FILE surfaces as null record fields off a non-null path (the
    * kernel's whole-file refusal), so corrupt segments are countable —
    * `filter(col("rec_type").isNull)` — instead of silently absent. */
  def records(spark: SparkSession, path: String): DataFrame =
    recordsOf(spark.read.format("binaryFile").load(path))

  /** STREAMING records: the same parse over a file-stream scan — new
    * segment files under `path` become micro-batches as the crawler
    * lands them (checkpointed file discovery; each segment is processed
    * exactly once per checkpoint). Compose with
    * [[graft.streaming.StreamingCurate.writer]] for the year-long-crawl
    * topology: segments → records → HTTP/WET text → curate tiers. */
  def recordsStream(spark: SparkSession, path: String): DataFrame =
    recordsOf(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema).load(path))

  private def responsesOf(recs: DataFrame): DataFrame =
    recs
      .filter(col("rec_type") === "response")
      .select(col("url"),
        to_timestamp(col("date"), "yyyy-MM-dd'T'HH:mm:ssX").as("fetch_ts"),
        GraftFunctions.httpResponse(col("block")).as("__h"))
      .filter(col("__h").isNotNull)
      .select(col("url"), col("fetch_ts"),
        col("__h.status").as("status"),
        col("__h.mime").as("mime"),
        col("__h.body").as("payload"))

  private def wetTextOf(recs: DataFrame): DataFrame =
    recs
      .filter(col("rec_type") === "conversion")
      .select(col("url"),
        to_timestamp(col("date"), "yyyy-MM-dd'T'HH:mm:ssX").as("fetch_ts"),
        col("block").cast("string").as("text"))

  /** The corrupt-segment ACCOUNTING view: one `(path)` row per file the
    * kernel refused whole (`rec_type IS NULL` off [[records]]).
    *
    * This exists because the typed views below FILTER on `rec_type` —
    * `responses()`/`wetText()` (and their streaming twins) necessarily
    * drop the null-fielded refusal rows, so a pipeline composed only
    * from a filtered view loses the corrupt-segment signal. Run this
    * over the same `path` (batch), or fork the [[recordsStream]]
    * topology through it (streaming — same checkpointed scan, second
    * sink), to keep the whole-file-refusal count observable; the
    * refusal CONTRACT itself (refused files never contribute partial
    * records to any view) is the kernel's, not the filter's. */
  def corruptSegments(spark: SparkSession, path: String): DataFrame =
    corruptSegmentsOf(records(spark, path))

  /** Streaming twin of [[corruptSegments]] — attach as its own sink
    * next to the curate topology so refusals stay countable live. */
  def corruptSegmentsStream(spark: SparkSession, path: String): DataFrame =
    corruptSegmentsOf(recordsStream(spark, path))

  private def corruptSegmentsOf(recs: DataFrame): DataFrame =
    recs.filter(col("rec_type").isNull).select(col("path"))

  /** The fetched-page view of a crawl: `response` records parsed
    * through the HTTP layer → `(url, fetch_ts, status, mime, payload)`.
    * Non-HTTP or truncated-header responses are dropped (they carry no
    * payload to curate). NOTE the filter also drops whole-file REFUSAL
    * rows — account for those with [[corruptSegments]] (this view alone
    * cannot distinguish "no responses" from "segment refused"). */
  def responses(spark: SparkSession, path: String): DataFrame =
    responsesOf(records(spark, path))

  /** Streaming twin of [[responses]]. */
  def responsesStream(spark: SparkSession, path: String): DataFrame =
    responsesOf(recordsStream(spark, path))

  /** The WET view: `conversion` records' plain text →
    * `(url, fetch_ts, text)`. Refusal rows are filtered out here too —
    * see [[corruptSegments]] for the accounting side. */
  def wetText(spark: SparkSession, path: String): DataFrame =
    wetTextOf(records(spark, path))

  /** Streaming twin of [[wetText]]. */
  def wetTextStream(spark: SparkSession, path: String): DataFrame =
    wetTextOf(recordsStream(spark, path))
}

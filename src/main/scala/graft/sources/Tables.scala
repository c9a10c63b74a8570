package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver testdata directories (TESTDATA.md): one parquet
  * per table under the per-scale dirs. The snapshot-scan surface (S1/S3 in
  * SURVEY.md sec 2.1): a full scan returns all rows/columns with the
  * sec 1.3 type mapping; Catalyst handles pushdown/pruning from here.
  */
object Tables {

  /** Plain table read. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` table has shipped with three physical shapes for `ts`
    * across testdata generations, all normalized here to a session-TZ
    * `TimestampType` so every downstream consumer (watermarks, window
    * aggs, text formats) sees one event-time type:
    *
    *   - nanosecond int64: Spark's parquet reader rejects it by default
    *     (PARQUET_TYPE_ILLEGAL); read nanos as long
    *     (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros
    *     the way DuckDB does on read (`ts div 1000` — integer division; a
    *     double division would lose precision above 2^53 ns).
    *   - `timestamp[us]` without UTC adjustment: Spark 4 infers
    *     `TIMESTAMP_NTZ`, which `withWatermark`/event-time windows reject.
    *     Cast to `TimestampType`: the session TZ is pinned UTC everywhere
    *     in this project, so the cast re-labels the same instant exactly
    *     (and DuckDB's naive timestamps agree, keeping the oracle green).
    *   - `timestamp[us]` UTC-adjusted: already `TimestampType`, pass through.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        requireUtcSession(spark, "Tables.events NTZ ts column")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** The NTZ→`TimestampType` cast is instant-preserving ONLY under a UTC
    * session TZ (the project-wide convention every entry point pins). A
    * caller with a non-UTC session would silently shift every event time,
    * so the convention is asserted at the cast site instead of trusted. */
  private[graft] def requireUtcSession(spark: SparkSession, what: String): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
      s"$what: casting TIMESTAMP_NTZ to TimestampType requires a UTC session " +
        s"timezone (got '$tz') — a non-UTC session would shift every instant. " +
        "Set spark.sql.session.timeZone=UTC.")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver testdata directories (TESTDATA.md): one parquet
  * per table under the per-scale dirs. The snapshot-scan surface (S1/S3 in
  * SURVEY.md sec 2.1): a full scan returns all rows/columns with the
  * sec 1.3 type mapping; Catalyst handles pushdown/pruning from here.
  */
object Tables {

  /** Plain table read. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` table is written with nanosecond timestamps, which
    * Spark's parquet reader rejects by default (PARQUET_TYPE_ILLEGAL).
    * Read nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * convert to a microsecond timestamp the way DuckDB does on read:
    * truncation (`ts div 1000` — integer division; a double division
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, sfDir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}

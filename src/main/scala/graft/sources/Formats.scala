package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format parity: the same table readable and writable as
  * parquet, ORC, CSV and JSON-lines with LOSSLESS round-trips — the
  * interchange layer a pipeline needs at its edges (crawler dumps are
  * JSONL/CSV; warehouse interchange is parquet/ORC).
  *
  * The text formats need care to stay lossless, all handled here:
  *  - CSV: quote-escaping with `escape="` (RFC-4180 doubling), multiLine
  *    read for embedded newlines, explicit micro-precision timestamp
  *    format, and a sentinel `nullValue` distinct from the empty string
  *    (CSV cannot otherwise tell `null` from `""`). A text field exactly
  *    equal to the sentinel would be read back as null — the inherent
  *    CSV ambiguity, moved to a string no real corpus contains.
  *  - JSON: explicit timestamp format (Spark's default drops sub-second
  *    digits on write), schema-enforced read (no inference drift).
  *  - Binary columns round-trip as base64 in text formats via Spark's
  *    native casts.
  *
  * Round-trip equality for every format is pinned in FormatsSpec; the
  * `format_roundtrip` declared query checks count/distinct/char-mass
  * integrity against the parquet original under the DuckDB oracle.
  */
object Formats {

  val Supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val NullSentinel = "__GRAFT_NULL__"

  def write(df: DataFrame, format: String, path: String): Unit = format match {
    case "parquet" => df.write.mode("overwrite").parquet(path)
    case "orc" => df.write.mode("overwrite").orc(path)
    case "csv" => df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullSentinel)
      .option("timestampFormat", TsFmt)
      .csv(path)
    case "json" => df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .option("ignoreNullFields", "false")
      .json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  def read(spark: SparkSession, format: String, path: String,
      schemaSpec: StructType): DataFrame = {
    // Always read with a nullable schema: a file can carry nulls whatever
    // the in-memory frame claimed, and Spark's multiLine CSV path skips
    // the nullValue→null conversion entirely when the user schema marks a
    // field non-nullable (observed on 4.1.2 — the sentinel comes back as
    // a literal string).
    val schema = StructType(schemaSpec.fields.map(_.copy(nullable = true)))
    format match {
    case "parquet" => spark.read.schema(schema).parquet(path)
    case "orc" => spark.read.schema(schema).orc(path)
    case "csv" => spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullSentinel)
      .option("multiLine", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)
    case "json" => spark.read.schema(schema)
      .option("timestampFormat", TsFmt)
      .json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** Write `df` as `format` under `dir/format`, read it back with the
    * original schema. */
  def roundTrip(df: DataFrame, format: String, dir: String): DataFrame = {
    val path = s"$dir/$format"
    write(df, format, path)
    read(df.sparkSession, format, path, df.schema)
  }
}

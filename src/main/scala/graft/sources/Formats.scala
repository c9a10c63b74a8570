package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{base64, col, unbase64}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

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
  *  - Binary columns (the multimodal media payloads): CSV/JSON cannot
  *    carry bytes, so they're base64-encoded on write and decoded on
  *    read — transparently, per the ORIGINAL schema's BinaryType fields.
  *
  * Round-trip equality for every format is pinned in FormatsSpec; the
  * `format_roundtrip` declared query checks count/distinct/char-mass
  * integrity against the parquet original under the DuckDB oracle.
  */
object Formats {

  val Supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  // TIMESTAMP_NTZ carries no zone: same micro precision, no offset
  // suffix (Spark's default NTZ text format drops sub-second digits the
  // same way the zoned default does)
  private val TsNtzFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
  private val NullSentinel = "__GRAFT_NULL__"

  private def isTextFormat(format: String): Boolean =
    format == "csv" || format == "json"

  /** Binary columns → base64 strings for the text formats (null stays
    * null). */
  private def encodeBinary(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == BinaryType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, base64(col(f.name)))
    }

  def write(df: DataFrame, format: String, path: String): Unit = {
    val out = if (isTextFormat(format)) encodeBinary(df) else df
    format match {
      case "parquet" => out.write.mode("overwrite").parquet(path)
      case "orc" => out.write.mode("overwrite").orc(path)
      case "csv" => out.write.mode("overwrite")
        .option("header", "true")
        .option("escape", "\"")
        .option("nullValue", NullSentinel)
        .option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsNtzFmt)
        .csv(path)
      case "json" => out.write.mode("overwrite")
        .option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsNtzFmt)
        .option("ignoreNullFields", "false")
        .json(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  def read(spark: SparkSession, format: String, path: String,
      schemaSpec: StructType): DataFrame = {
    // Always read with a nullable schema: a file can carry nulls whatever
    // the in-memory frame claimed, and Spark's multiLine CSV path skips
    // the nullValue→null conversion entirely when the user schema marks a
    // field non-nullable (observed on 4.1.2 — the sentinel comes back as
    // a literal string). Text formats additionally read BinaryType fields
    // as base64 strings and decode after.
    val nullable = StructType(schemaSpec.fields.map(_.copy(nullable = true)))
    val binaryCols = schemaSpec.fields.filter(_.dataType == BinaryType).map(_.name)
    val readSchema =
      if (isTextFormat(format))
        StructType(nullable.fields.map(f =>
          if (f.dataType == BinaryType) f.copy(dataType = StringType) else f))
      else nullable
    val raw = format match {
      case "parquet" => spark.read.schema(readSchema).parquet(path)
      case "orc" => spark.read.schema(readSchema).orc(path)
      case "csv" => spark.read.schema(readSchema)
        .option("header", "true")
        .option("escape", "\"")
        .option("nullValue", NullSentinel)
        .option("multiLine", "true")
        .option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsNtzFmt)
        .csv(path)
      case "json" => spark.read.schema(readSchema)
        .option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsNtzFmt)
        .json(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    if (isTextFormat(format))
      binaryCols.foldLeft(raw) { (d, c) =>
        // unbase64 is null-safe; empty payloads decode to empty bytes
        d.withColumn(c, unbase64(col(c)))
      }
    else raw
  }

  /** Write `df` as `format` under `dir/format`, read it back with the
    * original schema. */
  def roundTrip(df: DataFrame, format: String, dir: String): DataFrame = {
    val path = s"$dir/$format"
    write(df, format, path)
    read(df.sparkSession, format, path, df.schema)
  }
}

package graft.mongo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BSON value rendering rules (SURVEY.md sec 2.3 P8/P10/P12), the column
  * analogues of the reference's per-value dispatch
  * (reference: `src/adapter/mongodb.rs:379-492`).
  */
object BsonRender {

  /** ObjectId bytes → lowercase hex string
    * (reference: `src/adapter/mongodb.rs:379-383`). */
  def objectIdHex(c: Column): Column = lower(hex(c))

  /** BSON DateTime/Timestamp → `yyyy-MM-dd HH:mm:ss` text, UTC,
    * second precision (reference: `src/adapter/mongodb.rs:384-398`). */
  def datetimeText(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** BSON Binary → base64 text (reference: `src/adapter/mongodb.rs:399-406`). */
  def binaryBase64(c: Column): Column = base64(c)

  /** Epoch-millis → DateTime at second precision: `toDateTime(millis/1000)`
    * with integer division, missing (null) → epoch 0
    * (reference: `src/adapter/mongodb.rs:408-441`). */
  def epochMillisToTimestamp(c: Column): Column =
    timestamp_seconds(coalesce((c / 1000).cast(LongType), lit(0L)))

  /** Mongo heterogeneous array rule (P12): the array's element type is
    * decided by its FIRST element — Int32/Int64 → long list, Double →
    * double list, String → string list, anything else → empty list;
    * elements that do not convert to the chosen type render as their
    * per-type defaults (reference: `src/adapter/mongodb.rs:443-492`).
    * Input is the engine's decoded form: array of (kind, text) structs
    * with kind ∈ {int, long, double, string, other}. */
  def firstElementTypedArray(arr: Column): Column = {
    val firstKind = element_at(arr, 1).getField("kind")
    val longs = transform(arr, e =>
      coalesce(e.getField("text").try_cast(LongType), lit(0L)))
    val doubles = transform(arr, e =>
      coalesce(e.getField("text").try_cast(DoubleType), lit(0.0)))
    val strings = transform(arr, e =>
      coalesce(e.getField("text"), lit("")))
    when(size(arr) === 0, array().cast(ArrayType(StringType)))
      .when(firstKind.isin("int", "long"), longs.cast(ArrayType(StringType)))
      .when(firstKind === "double", doubles.cast(ArrayType(StringType)))
      .when(firstKind === "string", strings)
      .otherwise(array().cast(ArrayType(StringType)))
  }
}

package graft.types

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Golden tests for the type mapping tables (SURVEY.md §1.3; reference:
  * `src/adapter/postgres.rs:213-310`, `src/adapter/mongodb.rs:522-559`,
  * `src/adapter/clickhouse.rs:60-93`).
  */
class CHTypeSpec extends AnyFunSuite {
  import CHType._

  test("typeText renders like the reference's to_type_text") {
    assert(Int16.typeText == "Int16")
    assert(CHStr.nullable.typeText == "Nullable(String)")
    assert(Int32.array.typeText == "Array(Int32)")
    assert(FixedString(8).typeText == "FixedString(8)")
    assert(CHDateTime(Some("UTC")).typeText == "DateTime('UTC')")
    assert(DateTime64(3, None).typeText == "DateTime64(3)")
    assert(DateTime64(3, Some("UTC")).typeText == "DateTime64(3, 'UTC')")
    assert(Time64(6).typeText == "Time64(6)")
    assert(CHDecimal.nullable.array.typeText == "Array(Nullable(Decimal))")
  }

  test("PG udt mapping: scalars, nullability wrapping") {
    assert(fromPgUdt("int2", nullable = false) == Int16)
    assert(fromPgUdt("int2", nullable = true) == Int16.nullable)
    assert(fromPgUdt("int4", nullable = false) == Int32)
    assert(fromPgUdt("int", nullable = false) == Int32)
    assert(fromPgUdt("int8", nullable = false) == Int64)
    assert(fromPgUdt("float4", nullable = false) == Float32)
    assert(fromPgUdt("float8", nullable = false) == Float64)
    assert(fromPgUdt("numeric", nullable = true) == CHDecimal.nullable)
    for (s <- Seq("varchar", "text", "json", "jsonb"))
      assert(fromPgUdt(s, nullable = false) == CHStr)
    assert(fromPgUdt("bool", nullable = false) == Bool)
    assert(fromPgUdt("timestamp", nullable = false) == CHDateTime())
    assert(fromPgUdt("timestamptz", nullable = false) == CHDateTime())
    assert(fromPgUdt("date", nullable = true) == CHDate.nullable)
  }

  test("PG udt mapping: _-prefixed arrays are never Nullable-wrapped") {
    assert(fromPgUdt("_int2", nullable = true) == Int16.array)
    assert(fromPgUdt("_int4", nullable = true) == Int32.array)
    assert(fromPgUdt("_int8", nullable = true) == Int64.array)
    assert(fromPgUdt("_float4", nullable = true) == Float32.array)
    assert(fromPgUdt("_float8", nullable = true) == Float64.array)
    assert(fromPgUdt("_numeric", nullable = true) == CHDecimal.array)
    assert(fromPgUdt("_varchar", nullable = true) == CHStr.array)
    assert(fromPgUdt("_text", nullable = true) == CHStr.array)
    assert(fromPgUdt("_bool", nullable = true) == Bool.array)
  }

  test("PG udt mapping: unknown udt falls back to String (postgres.rs:297-308)") {
    assert(fromPgUdt("uuid", nullable = true) == CHStr.nullable)
    assert(fromPgUdt("inet", nullable = false) == CHStr)
  }

  test("Bson mapping: everything Nullable except _id; Null defers (Unknown)") {
    assert(fromBsonKind(BsonKind.BString, "name") == CHStr.nullable)
    assert(fromBsonKind(BsonKind.BObjectId, "_id") == CHStr)
    assert(fromBsonKind(BsonKind.BInt32, "age") == Int32.nullable)
    assert(fromBsonKind(BsonKind.BInt64, "n") == Int64.nullable)
    assert(fromBsonKind(BsonKind.BDouble, "x") == Float64.nullable)
    assert(fromBsonKind(BsonKind.BDecimal128, "d") == CHDecimal.nullable)
    assert(fromBsonKind(BsonKind.BBoolean, "b") == Bool.nullable)
    assert(fromBsonKind(BsonKind.BDateTime, "ts") == CHDateTime().nullable)
    assert(fromBsonKind(BsonKind.BTimestamp, "ts") == CHDateTime().nullable)
    assert(fromBsonKind(BsonKind.BNull, "c") == Unknown)
    assert(fromBsonKind(BsonKind.BUndefined, "c") == Unknown)
    for (k <- Seq(BsonKind.BDocument, BsonKind.BBinary, BsonKind.BRegex,
        BsonKind.BJsCode, BsonKind.BSymbol, BsonKind.BMaxKey, BsonKind.BMinKey,
        BsonKind.BDbPointer))
      assert(fromBsonKind(k, "f") == CHStr.nullable)
  }

  test("Spark type round-trip: CHType → Spark → CHType stable on the core set") {
    val cases: Seq[(CHType, DataType)] = Seq(
      Int16 -> ShortType, Int32 -> IntegerType, Int64 -> LongType,
      Float32 -> FloatType, Float64 -> DoubleType, Bool -> BooleanType,
      CHStr -> StringType, CHDate -> DateType, CHDateTime() -> TimestampType,
      CHStr.array -> ArrayType(StringType), Int32.array -> ArrayType(IntegerType)
    )
    cases.foreach { case (ch, dt) => assert(toSparkType(ch) == dt) }
    assert(toSparkType(CHDecimal) == DecimalType(38, 18))
    assert(fromSparkType(LongType, nullable = false) == Int64)
    assert(fromSparkType(StringType, nullable = true) == CHStr.nullable)
    assert(fromSparkType(ArrayType(StringType), nullable = true) == CHStr.array)
    // NTZ is first-class on the source side: parquet timestamp[us]
    // without UTC adjustment infers TIMESTAMP_NTZ, and the target type is
    // the same zone-less DateTime a zoned timestamp maps to (sec 1.3)
    assert(fromSparkType(TimestampNTZType, nullable = true) == CHDateTime().nullable)
    assert(fromSparkType(TimestampType, nullable = true) == CHDateTime().nullable)
  }
}

package graft.types

import org.apache.spark.sql.types._

/** ClickHouse-style target type ADT.
  *
  * Mirrors the reference's type model (reference:
  * `src/adapter/clickhouse.rs:19-93`): the engine's target schema language,
  * rendered to DDL text by [[CHType.typeText]] exactly as the reference's
  * `to_type_text` does.
  */
sealed trait CHType {
  def typeText: String

  def nullable: CHType = CHType.CHNullable(this)
  def array: CHType = CHType.CHArray(this)

  /** Strip one Nullable(...) wrapper, if present. */
  def stripNullable: CHType = this match {
    case CHType.CHNullable(inner) => inner
    case other                    => other
  }

  def isNullable: Boolean = this match {
    case CHType.CHNullable(_) => true
    case _                    => false
  }
}

object CHType {
  case object Int8    extends CHType { val typeText = "Int8" }
  case object Int16   extends CHType { val typeText = "Int16" }
  case object Int32   extends CHType { val typeText = "Int32" }
  case object Int64   extends CHType { val typeText = "Int64" }
  case object Int128  extends CHType { val typeText = "Int128" }
  case object Int256  extends CHType { val typeText = "Int256" }
  case object UInt8   extends CHType { val typeText = "UInt8" }
  case object UInt16  extends CHType { val typeText = "UInt16" }
  case object UInt32  extends CHType { val typeText = "UInt32" }
  case object UInt64  extends CHType { val typeText = "UInt64" }
  case object UInt128 extends CHType { val typeText = "UInt128" }
  case object UInt256 extends CHType { val typeText = "UInt256" }
  case object Float32 extends CHType { val typeText = "Float32" }
  case object Float64 extends CHType { val typeText = "Float64" }
  case object Bool    extends CHType { val typeText = "Bool" }
  case object CHStr   extends CHType { val typeText = "String" }
  case class FixedString(size: Long) extends CHType {
    def typeText = s"FixedString($size)"
  }
  case object CHDecimal extends CHType { val typeText = "Decimal" }
  case object CHDate    extends CHType { val typeText = "Date" }
  case object Date32    extends CHType { val typeText = "Date32" }
  case object CHTime    extends CHType { val typeText = "Time" }
  case class Time64(precision: Int) extends CHType {
    def typeText = s"Time64($precision)"
  }
  case class CHDateTime(timezone: Option[String] = None) extends CHType {
    def typeText = timezone.fold("DateTime")(tz => s"DateTime('$tz')")
  }
  case class DateTime64(precision: Int, timezone: Option[String] = None)
      extends CHType {
    def typeText =
      timezone.fold(s"DateTime64($precision)")(tz => s"DateTime64($precision, '$tz')")
  }
  case object UUID extends CHType { val typeText = "UUID" }
  case class CHArray(inner: CHType) extends CHType {
    def typeText = s"Array(${inner.typeText})"
  }
  case class CHNullable(inner: CHType) extends CHType {
    def typeText = s"Nullable(${inner.typeText})"
  }
  case object Unknown extends CHType { val typeText = "Unknown" }

  private def wrap(t: CHType, isNullable: Boolean): CHType =
    if (isNullable) t.nullable else t

  /** PostgreSQL `udt_name` → target type.
    *
    * Same mapping table as the reference (reference:
    * `src/adapter/postgres.rs:213-310`): `_`-prefixed udt names are arrays
    * (never wrapped Nullable), unknown udts fall back to String.
    */
  def fromPgUdt(udtName: String, nullable: Boolean): CHType = udtName match {
    case "int2"            => wrap(Int16, nullable)
    case "_int2"           => Int16.array
    case "int4" | "int"    => wrap(Int32, nullable)
    case "_int4"           => Int32.array
    case "int8"            => wrap(Int64, nullable)
    case "_int8"           => Int64.array
    case "float4"          => wrap(Float32, nullable)
    case "_float4"         => Float32.array
    case "float8"          => wrap(Float64, nullable)
    case "_float8"         => Float64.array
    case "numeric"         => wrap(CHDecimal, nullable)
    case "_numeric"        => CHDecimal.array
    case "varchar" | "text" | "json" | "jsonb" => wrap(CHStr, nullable)
    case "_varchar" | "_text"                  => CHStr.array
    case "bool"            => wrap(Bool, nullable)
    case "_bool"           => Bool.array
    case "timestamp" | "timestamptz" => wrap(CHDateTime(), nullable)
    case "date"            => wrap(CHDate, nullable)
    case _                 => wrap(CHStr, nullable) // unsupported → String
  }

  /** BSON value kind (as seen in a Mongo document) → target type.
    *
    * Everything is Nullable except `_id` (reference:
    * `src/adapter/mongodb.rs:522-559`). Null/Undefined map to Unknown, which
    * defers column creation (reference: `src/pipes/mongodb.rs:615-627`).
    */
  def fromBsonKind(kind: BsonKind, fieldName: String): CHType = {
    val base: CHType = kind match {
      case BsonKind.BString | BsonKind.BDocument | BsonKind.BBinary |
          BsonKind.BObjectId | BsonKind.BRegex | BsonKind.BJsCode |
          BsonKind.BSymbol | BsonKind.BMaxKey | BsonKind.BMinKey |
          BsonKind.BDbPointer =>
        CHStr
      case BsonKind.BBoolean    => Bool
      case BsonKind.BInt32      => Int32
      case BsonKind.BInt64      => Int64
      case BsonKind.BDouble     => Float64
      case BsonKind.BDecimal128 => CHDecimal
      case BsonKind.BDateTime | BsonKind.BTimestamp => CHDateTime()
      case BsonKind.BArray      => Unknown.array
      case BsonKind.BNull | BsonKind.BUndefined => Unknown
    }
    base match {
      case Unknown       => Unknown // never wrapped; column creation deferred
      case a: CHArray    => a // ClickHouse forbids Nullable(Array)
      case t if fieldName == "_id" => t // `_id` stays non-nullable
      case t             => t.nullable
    }
  }

  /** Target type → Spark type (our engine's physical schema language). */
  def toSparkType(t: CHType): DataType = t match {
    case Int8 | UInt8           => ByteType
    case Int16 | UInt16         => ShortType
    case Int32 | UInt32         => IntegerType
    case Int64 | UInt64 | Int128 | UInt128 | Int256 | UInt256 => LongType
    case Float32                => FloatType
    case Float64                => DoubleType
    case Bool                   => BooleanType
    case CHStr | FixedString(_) | UUID | Unknown => StringType
    case CHDecimal              => DecimalType(38, 18)
    case CHDate | Date32        => DateType
    case CHTime | Time64(_)     => StringType
    case CHDateTime(_) | DateTime64(_, _) => TimestampType
    case CHArray(inner)         => ArrayType(toSparkType(inner))
    case CHNullable(inner)      => toSparkType(inner)
  }

  /** Spark type → target type (used when the source is a Spark-native
    * table, e.g. parquet test data standing in for a PG table).
    */
  def fromSparkType(dt: DataType, nullable: Boolean): CHType = {
    val base: CHType = dt match {
      case ByteType              => Int8
      case ShortType             => Int16
      case IntegerType           => Int32
      case LongType              => Int64
      case FloatType             => Float32
      case DoubleType            => Float64
      case BooleanType           => Bool
      case StringType            => CHStr
      case _: DecimalType        => CHDecimal
      case DateType              => CHDate
      // parquet timestamps without UTC adjustment surface as NTZ; the
      // target type is the same second-precision DateTime either way
      case TimestampType | TimestampNTZType => CHDateTime()
      case ArrayType(inner, _)   => CHArray(fromSparkType(inner, nullable = false).stripNullable)
      case BinaryType            => CHStr
      case _                     => CHStr
    }
    base match {
      case a: CHArray => a // arrays are never wrapped Nullable
      case t          => wrap(t, nullable)
    }
  }
}

/** The BSON value kinds the reference distinguishes
  * (reference: `src/adapter/mongodb.rs:522-559`).
  */
sealed trait BsonKind
object BsonKind {
  case object BString     extends BsonKind
  case object BDocument   extends BsonKind
  case object BBinary     extends BsonKind
  case object BObjectId   extends BsonKind
  case object BRegex      extends BsonKind
  case object BJsCode     extends BsonKind
  case object BSymbol     extends BsonKind
  case object BMaxKey     extends BsonKind
  case object BMinKey     extends BsonKind
  case object BDbPointer  extends BsonKind
  case object BBoolean    extends BsonKind
  case object BInt32      extends BsonKind
  case object BInt64      extends BsonKind
  case object BDouble     extends BsonKind
  case object BDecimal128 extends BsonKind
  case object BDateTime   extends BsonKind
  case object BTimestamp  extends BsonKind
  case object BArray      extends BsonKind
  case object BNull       extends BsonKind
  case object BUndefined  extends BsonKind
}

/** A column in the engine's target-schema vocabulary: name, target type,
  * PK membership, comment. The unit of the DDL generator and the cast
  * planner.
  */
case class CHColumn(
    name: String,
    chType: CHType,
    isPrimaryKey: Boolean = false,
    comment: String = ""
)

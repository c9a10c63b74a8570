package graft.mongo

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.types.{BsonKind, CHColumn, CHType}

/** MongoDB-style dynamic schema inference: value-driven, first-type-wins,
  * append-only (reference: `src/pipes/mongodb.rs:588-648`,
  * `docs/mongodb/README.md:12-14`).
  *
  * Semantics pinned (SURVEY.md sec 1.4 + sec 7.4 hard parts 4-5):
  *  - the initial table has only `_id` (reference: `pipes/mongodb.rs:543-554`);
  *  - a column is created the first time a *typed* value is seen; its type
  *    is that first value's type; later conflicting types are ignored;
  *  - a column whose first value is null/undefined (`Unknown`) is NOT
  *    created until a typed value arrives; earlier rows are never
  *    backfilled (reference: `pipes/mongodb.rs:615-627`);
  *  - inference is an ordered fold over batches on the driver — never a
  *    parallel reduce, because first-type-wins is order-dependent.
  */
object MongoInference {

  /** The initial target schema: just the `_id` PK
    * (reference: `src/pipes/mongodb.rs:543-554`). */
  def initialSchema: Vector[CHColumn] =
    Vector(CHColumn("_id", CHType.CHStr, isPrimaryKey = true))

  /** Fold one batch of documents (each a field-name → BSON-kind listing,
    * in document order) into the running schema. Returns the new schema;
    * appended columns keep first-seen order. */
  def foldBatch(
      schema: Vector[CHColumn],
      docs: IterableOnce[Seq[(String, BsonKind)]]): Vector[CHColumn] = {
    var out = schema
    var known = schema.map(_.name).toSet
    docs.iterator.foreach { fields =>
      fields.foreach { case (name, kind) =>
        if (!known.contains(name)) {
          CHType.fromBsonKind(kind, name) match {
            case CHType.Unknown => // deferred: wait for a typed value
            case t =>
              out = out :+ CHColumn(name, t)
              known += name
          }
        }
        // known columns: conflicting later kinds are ignored (first wins)
      }
    }
    out
  }

  /** Spark-kind classification of a value coming out of a semi-structured
    * row (the test stand-in for live BSON). */
  def kindOf(v: Any): BsonKind = v match {
    case null                => BsonKind.BNull
    case _: String           => BsonKind.BString
    case _: java.lang.Boolean => BsonKind.BBoolean
    case _: java.lang.Integer => BsonKind.BInt32
    case _: java.lang.Long   => BsonKind.BInt64
    case _: java.lang.Double | _: java.lang.Float => BsonKind.BDouble
    case _: java.math.BigDecimal | _: scala.math.BigDecimal => BsonKind.BDecimal128
    case _: java.sql.Timestamp | _: java.time.Instant => BsonKind.BDateTime
    case _: Array[Byte]          => BsonKind.BBinary // before the Array case
    case _: Seq[_] | _: Array[_] => BsonKind.BArray
    case _: Map[_, _] | _: Row   => BsonKind.BDocument
    case _                       => BsonKind.BString
  }

  /** BSON kind of a typed DataFrame column. In a DataFrame every column has
    * ONE static type, so the only data-dependent part of inference is
    * whether (and when, in `orderCol` order) a field's first NON-NULL value
    * arrives — which is what [[inferFromDataFrame]] aggregates. */
  def kindOfType(dt: DataType): BsonKind = dt match {
    case StringType                 => BsonKind.BString
    case BooleanType                => BsonKind.BBoolean
    case ByteType | ShortType | IntegerType => BsonKind.BInt32
    case LongType                   => BsonKind.BInt64
    case FloatType | DoubleType     => BsonKind.BDouble
    case _: DecimalType             => BsonKind.BDecimal128
    case TimestampType | TimestampNTZType | DateType => BsonKind.BDateTime
    case BinaryType                 => BsonKind.BBinary
    case _: ArrayType               => BsonKind.BArray
    case _: MapType | _: StructType => BsonKind.BDocument
    case NullType                   => BsonKind.BNull
    case _                          => BsonKind.BString
  }

  /** Infer over a DataFrame of documents in `orderCol` order, distributed:
    * the first-typed-value position of every field is ONE aggregation over
    * an exploded (field, order-if-non-null) projection — map-side partial
    * min, one tiny shuffle on ≤ |fields| keys — and the driver collects
    * exactly one row per field that has a typed value (O(fields), never
    * O(rows)). First-type-wins order is preserved: columns append sorted by
    * (first typed order, field position), which is the order the reference's
    * coordinator fold would create them in (`src/pipes/mongodb.rs:588-648`).
    * Fields whose values are all null stay deferred (Unknown), like the
    * fold's BNull deferral. */
  def inferFromDataFrame(
      df: DataFrame, orderCol: String,
      schema: Vector[CHColumn] = initialSchema): Vector[CHColumn] = {
    val known = schema.map(_.name).toSet
    val fields = df.schema.fields.filterNot(_.name == orderCol)
      .filterNot(f => known.contains(f.name))
    if (fields.isEmpty) return schema
    val firstTyped = firstTypedFields(df, orderCol, known)
    val byName = fields.map(f => f.name -> f).toMap
    firstTyped.foldLeft(schema) { (acc, name) =>
      val f = byName(name)
      CHType.fromBsonKind(kindOfType(f.dataType), f.name) match {
        case CHType.Unknown => acc // all-null (NullType) columns stay deferred
        case t              => acc :+ CHColumn(f.name, t)
      }
    }
  }

  /** The distributed first-typed-value aggregation, exposed so specs can
    * pin the driver-traffic bound: returns EXACTLY one element per field
    * with at least one non-null value, ordered by (first typed order,
    * field position) — never O(rows). */
  private[mongo] def firstTypedFields(
      df: DataFrame, orderCol: String, exclude: Set[String]): Seq[String] = {
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields.filterNot(_.name == orderCol)
      .filterNot(f => exclude.contains(f.name))
    val pairs = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("f"), lit(i).as("pos"),
        when(col(f.name).isNotNull, col(orderCol)).as("o"))
    }
    df.select(explode(array(pairs.toIndexedSeq: _*)).as("p"))
      .select(col("p.f").as("f"), col("p.pos").as("pos"), col("p.o").as("o"))
      .where(col("o").isNotNull)
      .groupBy(col("f"), col("pos")).agg(min(col("o")).as("first_o"))
      .orderBy(col("first_o"), col("pos"))
      .select(col("f"))
      .collect().map(_.getString(0)).toSeq
  }
}

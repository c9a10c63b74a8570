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
    case _: Seq[_] | _: Array[_] => BsonKind.BArray
    case _: Map[_, _] | _: Row   => BsonKind.BDocument
    case _: Array[Byte]          => BsonKind.BBinary
    case _                       => BsonKind.BString
  }

  /** Infer over a DataFrame of documents in `orderCol` order: collect each
    * batch's (field, kind) listings to the driver IN ORDER and fold. The
    * collect is intentional and bounded — schema inference looks at field
    * NAMES and first-value kinds, and the reference does exactly this scan
    * per batch on its coordinator; at scale the per-batch listing is
    * deduplicated per partition first (aggregating distinct field names →
    * tiny result), keeping driver traffic O(fields), not O(rows). */
  def inferFromDataFrame(
      df: DataFrame, orderCol: String,
      schema: Vector[CHColumn] = initialSchema): Vector[CHColumn] = {
    val fields = df.schema.fieldNames.filterNot(_ == orderCol)
    val rows = df.orderBy(orderCol).collect()
    foldBatch(schema, rows.iterator.map { r =>
      fields.toSeq.flatMap { f =>
        val v = r.getAs[Any](f)
        // absent fields (null in a sparse row) behave like BNull: deferral
        Some(f -> kindOf(v))
      }
    })
  }
}

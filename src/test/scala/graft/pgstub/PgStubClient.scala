package graft.pgstub

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import graft.live.{JdbcClient, JdbcConnInfo}

/** JDBC façade over [[PgStubEngine]] — the transport seam the live pipe
  * already speaks ([[JdbcClient]]'s `query`/`execute`/`copyOut` verbs),
  * routed into the executable engine instead of a socket. Result schemas
  * are inferred from the evaluated values, so the pipe consumes exactly
  * what a driver-built ResultSet would give it (typed lsn/xid/data
  * columns for the peek, booleans for the is_nullable/is_primary_key
  * expressions, longs for oids).
  *
  * `copyChunkSize` cuts the COPY text stream at arbitrary byte positions
  * (defaults to a deliberately awkward 7 bytes) so escapes and multi-byte
  * UTF-8 sequences split across chunks — the D6 chunk-state contract.
  */
final class PgStubClient(val engine: PgStubEngine, copyChunkSize: Int = 7,
    beforeCopy: () => Unit = () => ())
    extends JdbcClient(JdbcConnInfo("jdbc:graft-pgstub:none")) {

  override def ping(): Boolean = true
  override def close(): Unit = ()

  override def execute(sql: String): Unit = engine.execute(sql)

  override def query(sql: String): (StructType, Vector[Row]) = {
    val (names, rows) = engine.query(sql)
    val schema = StructType(names.zipWithIndex.map { case (n, i) =>
      StructField(n, sparkTypeOf(rows.iterator.map(_(i))), nullable = true)
    })
    (schema,
      rows.map(vs => new GenericRowWithSchema(vs.toArray[Any], schema): Row)
        .toVector)
  }

  override protected def copyOutSql(sql: String): Option[graft.live.JdbcClient.CopyStream] = {
    // interleave seam: commits injected here land between slot creation
    // and the COPY reads — the snapshot↔CDC overlap window
    // (LivePgPipeSpec's handoff case)
    beforeCopy()
    // abort is a no-op: the in-memory stub holds no protocol state
    Some(new graft.live.JdbcClient.CopyStream(
      engine.copyChunks(sql, copyChunkSize), () => ()))
  }

  /** First non-null value decides the column type; all-null (or empty)
    * columns degrade to string, which every consumer null-checks. */
  private def sparkTypeOf(values: Iterator[Any]): DataType =
    values.collectFirst {
      case _: java.lang.Long => LongType
      case _: java.lang.Integer => IntegerType
      case _: java.lang.Boolean => BooleanType
      case _: java.lang.Double => DoubleType
      case _: String => StringType
      case _: Array[Byte] => BinaryType
    }.getOrElse(StringType)
}

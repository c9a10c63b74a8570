package graft.chstub

import org.apache.spark.sql.types.{DataType, StringType}
import graft.live.{JdbcClient, JdbcConnInfo}

/** JDBC façade over [[ChStubEngine]] — the TARGET-side twin of
  * [[graft.pgstub.PgStubClient]]: the verbs the pipe's target path
  * speaks (`ping`/`execute`/`queryScalar`/`columnsOf`) routed into the
  * executable ClickHouse statement engine instead of a socket, so the
  * full reference topology (postgres → clickhouse) runs through
  * `Main.runPostgresWith` with zero real services — exercised end to end
  * by [[graft.live.FullTopologySpec]]. */
class ChStubClient(val engine: ChStubEngine)
    extends JdbcClient(JdbcConnInfo("jdbc:graft-chstub:none")) {

  override def ping(): Boolean = true
  override def close(): Unit = ()

  override def execute(sql: String): Unit = engine.execute(sql)

  /** The target path's only scalar read is the `SELECT EXISTS …`
    * emptiness probe (K6), which the engine's strict grammar serves. */
  override def queryScalar(sql: String): Option[Any] = Some(engine.query(sql))

  /** Drift reconciliation reads the live column list; types are not
    * consulted on this path (ADD COLUMN decides on NAMES), so they
    * surface as strings like a DESCRIBE would. */
  override def columnsOf(
      database: Option[String], table: String): Seq[(String, DataType, Boolean)] = {
    val db = database.getOrElse("graft")
    if (!engine.tableExists(db, table)) Seq.empty
    else engine.table(db, table).columns.map(c => (c.name, StringType, true)).toSeq
  }
}

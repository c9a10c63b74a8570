package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Changelog
import graft.ddl.Ddl
import graft.ops.CoreOps
import graft.types.CHColumn

/** The live ClickHouse sink seam: applies a CDC batch as the reference's
  * statement sequence — deduped batched INSERTs, then one DELETE
  * mutation, truncates immediately at routing (SURVEY.md sec 2.5 and
  * sec 3 EP3 write order: `src/pipes/postgres.rs:391-485`) — against a
  * pluggable `execute` function (a JDBC/HTTP client in live mode; a
  * collector in tests).
  *
  * Statement TEXT is rendered distributed ([[ClickHouseSql
  * .insertStatements]]); execution is driver-sequenced because the
  * reference's write order (truncate → inserts → deletes, then advance
  * the cursor) is a correctness contract, not a throughput choice — the
  * expensive part (rendering) scales out, the cheap part (statement
  * submission) is ordered.
  */
class StatementSink(
    database: String,
    table: String,
    columns: Seq[CHColumn],
    execute: String => Unit,
    maskColumns: Set[String] = Set.empty,
    copyBatchSize: Int = 100000
)(implicit spark: SparkSession) {

  private val pkCols = columns.filter(_.isPrimaryKey).map(_.name)

  def createTable(options: graft.ddl.TableOptions = graft.ddl.TableOptions()): Unit =
    execute(Ddl.createTableQuery(database, table, columns, options))

  /** Apply one batch of changelog rows (op, seq, data...). Returns
    * (inserted, deleted, truncated) counts. */
  def applyBatch(batch: DataFrame): (Long, Long, Boolean) = {
    // K3: truncate executes immediately at routing — before the batch's
    // queued upserts and deletes
    val hasTruncate = !batch.filter(col("op") === Changelog.OpTruncate).isEmpty
    if (hasTruncate) execute(Ddl.truncateQuery(database, table))

    // K1: upserts deduped last-wins per PK, rendered per partition
    val ups = CoreOps.dedupLastWinsAgg(
      CoreOps.upserts(batch), pkCols, "seq")
    val upCount = ups.count()
    if (upCount > 0) {
      ClickHouseSql.insertStatements(
        ups.select(columns.map(c => col(c.name)): _*),
        database, table, columns, copyBatchSize, maskColumns)
        .collect().filter(_.nonEmpty).foreach(execute)
    }

    // K2: deletes run AFTER the inserts of the same batch, not deduped
    val delKeys = CoreOps.deletes(batch).select(pkCols.map(col): _*)
    val delCount = delKeys.count()
    if (delCount > 0) {
      execute(ClickHouseSql.deleteQuery(
        database, table, columns, delKeys.collect().toSeq))
    }
    (upCount, delCount, hasTruncate)
  }
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Changelog
import graft.ddl.Ddl
import graft.live.{JdbcConnInfo, JdbcExec}
import graft.ops.CoreOps
import graft.types.CHColumn

/** The live sink: applies a CDC batch as the reference's statement
  * sequence — deduped batched INSERTs, then one DELETE pass, truncates
  * immediately at routing (SURVEY.md sec 2.5 and sec 3 EP3 write order:
  * `src/pipes/postgres.rs:391-485`) — against a pluggable `execute`
  * function (a [[graft.live.JdbcClient]] in live mode; a collector in
  * tests).
  *
  * Statement TEXT always renders distributed ([[ClickHouseSql
  * .insertStatements]]). Execution splits by ordering requirement:
  *
  *  - TRUNCATE and DELETEs are driver-sequenced — their position in the
  *    batch (truncate first, deletes after the batch's inserts) is a
  *    correctness contract (reference write order), not a throughput
  *    choice. DELETE keys are bounded by the peek quantum (≤
  *    `peek_changes_limit`, 65,536 default) and are chunked into
  *    `deleteChunkSize`-key statements so no single statement grows with
  *    the batch.
  *  - INSERTs within a batch are order-free ACROSS statements (the
  *    reference itself splits them into independent `copy_batch_size`
  *    chunks — `src/pipes/postgres.rs:181-216`), so with `insertExec`
  *    set they execute ON EXECUTORS: each partition opens its own
  *    connection and runs its own rendered statements
  *    ([[JdbcExec.executePartitions]]) — the statement text never
  *    transits the driver. Without `insertExec` (tests, non-JDBC
  *    executors) they collect and run through `execute` in driver order.
  *
  * The barrier between the stages is the action itself: the INSERT stage
  * is a Spark action that completes before the first DELETE is issued, so
  * the reference's truncate → inserts → deletes order holds even with
  * distributed execution.
  */
class StatementSink(
    database: String,
    table: String,
    columns: Seq[CHColumn],
    execute: String => Unit,
    maskColumns: Set[String] = Set.empty,
    copyBatchSize: Int = 100000,
    dialect: SqlDialect = ClickHouseDialect,
    insertExec: Option[JdbcConnInfo] = None,
    deleteChunkSize: Int = 100000
)(implicit spark: SparkSession) {

  private val pkCols = columns.filter(_.isPrimaryKey).map(_.name)

  def createTable(options: graft.ddl.TableOptions = graft.ddl.TableOptions()): Unit =
    execute(dialect.createTableQuery(database, table, columns, options))

  def truncate(): Unit = execute(dialect.truncateQuery(database, table))

  /** Count rows IN the rendering pass via an accumulator — a separate
    * count() would re-scan the (possibly very large) source. Accumulator
    * counts can over-report on task retries; the return value is
    * informational (progress/logging), the write itself is exact. */
  private def countedRows(df: DataFrame): (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val acc = spark.sparkContext.longAccumulator("statementSinkRows")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(df.schema)
    (df.mapPartitions { it => it.map { r => acc.add(1); r } }(enc), acc)
  }

  /** Bulk-load a snapshot (EP2 first_sync): deduped-by-nothing straight
    * INSERT stream, distributed when `insertExec` is set. Returns rows
    * written — counted during the single rendering pass. */
  def bulkInsert(df: DataFrame): Long = {
    val aligned = df.select(columns.map(c => col(c.name)): _*)
    val (counted, acc) = countedRows(aligned)
    val stmts = ClickHouseSql.insertStatements(
      counted, database, table, columns, copyBatchSize, maskColumns, dialect)
    insertExec match {
      case Some(info) => JdbcExec.executePartitions(stmts, info)
      case None => stmts.collect().filter(_.nonEmpty).foreach(execute)
    }
    acc.value
  }

  /** Apply one batch of changelog rows (op, seq, data...). Returns
    * (inserted, deleted, truncated) counts. */
  def applyBatch(batch: DataFrame): (Long, Long, Boolean) = {
    // K3: truncate executes immediately at routing — before the batch's
    // queued upserts and deletes
    val hasTruncate = !batch.filter(col("op") === Changelog.OpTruncate).isEmpty
    if (hasTruncate) truncate()

    // K1: upserts deduped last-wins per PK, rendered per partition; the
    // upsert count rides the rendering pass (no separate count() job).
    // A PK-LESS table has no key to dedup on — dedupLastWinsAgg with zero
    // group columns would collapse the WHOLE batch to its single max-seq
    // row (silent data loss); without a key every upsert is its own row.
    val ups =
      if (pkCols.isEmpty) CoreOps.upserts(batch)
      else CoreOps.dedupLastWinsAgg(CoreOps.upserts(batch), pkCols, "seq")

    // Dialects without insert-as-append upsert semantics (ANSI): clear the
    // batch's upsert keys first, so a key synced in an earlier batch — or
    // a replay after a partial failure — re-inserts cleanly instead of
    // violating the PK constraint. Keys STREAM to the driver one
    // partition at a time (`toLocalIterator` on the cached batch), so
    // driver memory stays bounded by a partition even if
    // `peek_changes_limit` is configured far above its 65,536 default;
    // chunked like K2 deletes; runs before the inserts, after the
    // truncate, preserving the reference's statement order otherwise.
    if (dialect.upsertRequiresDeleteFirst && pkCols.nonEmpty) {
      import scala.jdk.CollectionConverters._
      ups.select(pkCols.map(col): _*).toLocalIterator().asScala
        .grouped(deleteChunkSize).foreach { chunk =>
          execute(dialect.deleteQuery(database, table, columns, chunk))
        }
    }

    val (counted, acc) = countedRows(ups.select(columns.map(c => col(c.name)): _*))
    val stmts = ClickHouseSql.insertStatements(
      counted, database, table, columns, copyBatchSize, maskColumns, dialect)
    insertExec match {
      case Some(info) => JdbcExec.executePartitions(stmts, info)
      case None => stmts.collect().filter(_.nonEmpty).foreach(execute)
    }
    val upCount = acc.value

    // K2: deletes run AFTER the inserts of the same batch, not deduped.
    // Keys stream partition-at-a-time like the upsert-clear above (the
    // count rides the same iteration — no extra action); chunked so
    // statement size is bounded regardless of batch shape. A delete
    // without PK columns is ill-defined (the rendered statement would
    // have an empty predicate) — fail loudly instead of emitting
    // malformed SQL.
    val deletes = CoreOps.deletes(batch)
    if (pkCols.isEmpty) {
      if (!deletes.isEmpty) throw new IllegalStateException(
        s"$database.$table has no primary-key columns: delete events " +
          "cannot be applied (no key to match rows by)")
      (upCount, 0L, hasTruncate)
    } else {
      import scala.jdk.CollectionConverters._
      var delCount = 0L
      deletes.select(pkCols.map(col): _*).toLocalIterator().asScala
        .grouped(deleteChunkSize).foreach { chunk =>
          execute(dialect.deleteQuery(database, table, columns, chunk))
          delCount += chunk.size
        }
      (upCount, delCount, hasTruncate)
    }
  }

  /** Adapt to the routed-pipe seam ([[graft.pipe.BatchSink]]): batch ids
    * are implicit in the statement sequence, emptiness comes from the
    * caller's probe (K6 — `SELECT exists(...)` on the live target). */
  def asBatchSink(nonEmptyProbe: () => Boolean): graft.pipe.BatchSink =
    new graft.pipe.BatchSink {
      def appendBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val _ = applyBatch(batch)
      }
      def isEmpty: Boolean = !nonEmptyProbe()
    }
}

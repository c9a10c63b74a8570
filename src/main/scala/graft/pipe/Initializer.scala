package graft.pipe

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Row
import graft.ddl.{Ddl, TableOptions}
import graft.sinks.SqlDialect
import graft.sources.CatalogSql
import graft.types.CHColumn

/** The pipe's *initialize* phase (reference: `src/pipes/mod.rs:11-16`,
  * executed in `src/pipes/postgres.rs:110-120`): make first-run UX a
  * non-event by creating everything the sync loop assumes exists —
  * the publication and replication slot on the source, and the target
  * tables (created from introspected source schema when absent,
  * ADD-COLUMN drift-reconciled when present).
  *
  * Both entry points are written against function seams (`query`,
  * `execute`, `targetColumns`) rather than concrete clients so the full
  * statement sequence is integration-testable — the publication path
  * against a scripted PG-catalog fake, the table path against embedded
  * Derby with [[graft.sinks.AnsiDialect]] — and each returns the
  * statements it executed, in order.
  */
object Initializer {

  /** setup_publication (reference: `src/pipes/postgres.rs:521-612`):
    *
    *  1. create the publication if absent, over ALL configured tables
    *     (`:531-561` — zero tables is a hard config error, `:546-550`);
    *  2. reconcile the publication's table list — ALTER … ADD TABLE for
    *     each configured table not yet published (`:563-587`), which
    *     makes the create idempotent across config edits;
    *  3. create the logical replication slot on the pgoutput plugin if
    *     absent (`:589-607`).
    *
    * @param query   row-returning catalog read (e.g. `client.query(_)._2`)
    * @param execute statement execution on the SOURCE (publication and
    *                slot DDL run against Postgres, not the target)
    * @param tables  configured (schema, table) pairs
    * @return the statements executed, in order (empty = all existed)
    */
  def setupPublication(
      query: String => Seq[Row],
      execute: String => Unit,
      publicationName: String,
      slotName: String,
      tables: Seq[(String, String)]): Seq[String] = {
    require(tables.nonEmpty,
      "No source tables specified in Postgres configuration")
    val executed = ArrayBuffer.empty[String]
    def run(sql: String): Unit = { execute(sql); executed += sql }

    if (query(CatalogSql.pgFindPublication(publicationName)).isEmpty)
      run(CatalogSql.pgCreatePublication(
        publicationName, tables.map { case (s, t) => s"$s.$t" }))

    // reconcile runs whether or not we just created: a publication that
    // pre-existed with a stale table list gains the missing tables
    val published = query(CatalogSql.pgPublicationTables(publicationName))
      .map(r => (r.getString(0), r.getString(1))).toSet
    tables.filterNot(published.contains).foreach { case (s, t) =>
      run(CatalogSql.pgAlterPublicationAdd(publicationName, Seq(s"$s.$t")))
    }

    if (query(CatalogSql.pgFindSlot(slotName)).isEmpty)
      run(CatalogSql.pgCreateSlot(slotName))

    executed.toSeq
  }

  /** setup_table for ONE table (reference: `src/pipes/postgres.rs:614-743`):
    * probe the target's existing columns; no columns → the table is absent
    * → CREATE TABLE from the introspected source schema (`:640-667`);
    * otherwise ADD COLUMN each source column the target lacks (`:679-725`,
    * Unknown-typed columns deferred). Statement text comes from the
    * target's [[SqlDialect]], so the same lifecycle drives ClickHouse
    * (byte-compatible DDL via [[Ddl]]) and portable ANSI endpoints.
    *
    * @param targetColumns probe of the target's current column names
    *                      (empty = table does not exist); JDBC metadata
    *                      (`DatabaseMetaData.getColumns`) is the portable
    *                      probe, `system.columns` the CH-native one
    * @return the statements executed, in order (empty = schema in sync)
    */
  def setupTable(
      targetColumns: () => Seq[String],
      execute: String => Unit,
      dialect: SqlDialect,
      database: String,
      table: String,
      sourceColumns: Seq[CHColumn],
      options: TableOptions = TableOptions(),
      tableComment: String = ""): Seq[String] = {
    val executed = ArrayBuffer.empty[String]
    def run(sql: String): Unit = { execute(sql); executed += sql }

    val existing = targetColumns()
    if (existing.isEmpty)
      run(dialect.createTableQuery(
        database, table, sourceColumns, options, tableComment))
    else {
      // membership is CASE-INSENSITIVE on both sides: case-folding
      // engines report `userId` back as USERID/userid, and re-issuing
      // ADD COLUMN for a column the target already holds would fail
      // every restart. The emitted DDL keeps the source's case.
      val have = existing.map(_.toLowerCase).toSet
      Ddl.driftColumns(
        sourceColumns.filterNot(c => have.contains(c.name.toLowerCase)),
        Set.empty)
        .foreach(c => run(dialect.addColumnQuery(database, table, c)))
    }

    executed.toSeq
  }
}

package graft.sources

/** The catalog/introspection SQL a live-Postgres source issues (SURVEY.md
  * sec 2.1 S5/S6) — the same queries the reference runs, kept as tested
  * constants so the JDBC source implementation is a mechanical fill-in.
  * (reference: `src/adapter/postgres.rs:657-785`.)
  */
object CatalogSql {

  /** Column listing with PK membership and comments
    * (reference: `src/adapter/postgres.rs:696-758`). */
  def pgColumns(schema: String, table: String): String =
    s"""SELECT c.column_name, c.udt_name, c.is_nullable = 'YES' AS is_nullable,
       |       c.ordinal_position,
       |       EXISTS (
       |         SELECT 1 FROM information_schema.table_constraints tc
       |         JOIN information_schema.key_column_usage kcu
       |           ON tc.constraint_name = kcu.constraint_name
       |          AND tc.table_schema = kcu.table_schema
       |         WHERE tc.constraint_type = 'PRIMARY KEY'
       |           AND tc.table_schema = '$schema' AND tc.table_name = '$table'
       |           AND kcu.column_name = c.column_name
       |       ) AS is_primary_key,
       |       COALESCE(pgd.description, '') AS comment
       |FROM information_schema.columns c
       |LEFT JOIN pg_catalog.pg_statio_all_tables st
       |  ON st.schemaname = c.table_schema AND st.relname = c.table_name
       |LEFT JOIN pg_catalog.pg_description pgd
       |  ON pgd.objoid = st.relid AND pgd.objsubid = c.ordinal_position
       |WHERE c.table_schema = '$schema' AND c.table_name = '$table'
       |ORDER BY c.ordinal_position
       |""".stripMargin

  /** Table comment (reference: `src/adapter/postgres.rs:657-694`). */
  def pgTableComment(schema: String, table: String): String =
    s"""SELECT COALESCE(obj_description(('"$schema"."$table"')::regclass), '')
       |""".stripMargin

  /** Row-count estimate from planner stats — progress only, never
    * correctness (reference: `src/adapter/postgres.rs:760-785`). */
  def pgRowEstimate(schema: String, table: String): String =
    s"""SELECT reltuples::bigint FROM pg_class
       |WHERE oid = ('"$schema"."$table"')::regclass
       |""".stripMargin

  /** Relation-id ↔ table-name map for pgoutput decoding
    * (reference: `src/adapter/postgres.rs:110-156`). */
  def pgRelationIds(schema: String, tables: Seq[String]): String = {
    val inList = tables.map(t => s"'$t'").mkString(", ")
    s"""SELECT c.oid, n.nspname, c.relname
       |FROM pg_class c JOIN pg_namespace n ON n.oid = c.relnamespace
       |WHERE n.nspname = '$schema' AND c.relname IN ($inList)
       |""".stripMargin
  }

  /** Publication existence probe for the initialize phase
    * (reference: `src/adapter/postgres.rs:533-553`). */
  def pgFindPublication(name: String): String =
    s"SELECT pubname AS name FROM pg_publication WHERE pubname = '$name'"

  /** Tables currently in a publication — drives the idempotent
    * table-list reconcile (reference: `src/adapter/postgres.rs:555-572`). */
  def pgPublicationTables(name: String): String =
    s"SELECT schemaname AS schema_name, tablename AS table_name " +
      s"FROM pg_publication_tables WHERE pubname = '$name'"

  /** Create the publication over the configured tables
    * (reference: `src/adapter/postgres.rs:574-594`). */
  def pgCreatePublication(name: String, qualifiedTables: Seq[String]): String =
    s"CREATE PUBLICATION $name FOR TABLE ${qualifiedTables.mkString(", ")}"

  /** Add missing tables to an existing publication
    * (reference: `src/adapter/postgres.rs:596-612`). */
  def pgAlterPublicationAdd(name: String, qualifiedTables: Seq[String]): String =
    s"ALTER PUBLICATION $name ADD TABLE ${qualifiedTables.mkString(", ")}"

  /** Replication-slot existence probe
    * (reference: `src/adapter/postgres.rs:632-655`). */
  def pgFindSlot(slot: String): String =
    s"SELECT slot_name, wal_status FROM pg_replication_slots " +
      s"WHERE slot_name = '$slot'"

  /** Create the logical replication slot on the pgoutput plugin
    * (reference: `src/adapter/postgres.rs:614-630`). */
  def pgCreateSlot(slot: String): String =
    s"SELECT pg_create_logical_replication_slot('$slot', 'pgoutput')"

  /** CDC peek (S2): non-consuming bounded read of the replication slot
    * (reference: `src/adapter/postgres.rs:787-812`). */
  def pgPeekChanges(slot: String, publication: String, limit: Long): String =
    s"""SELECT lsn, xid, data
       |FROM pg_logical_slot_peek_binary_changes(
       |  '$slot', NULL, $limit,
       |  'proto_version', '1', 'publication_names', '$publication')
       |""".stripMargin

  /** Cursor advance — the at-least-once commit point
    * (reference: `src/adapter/postgres.rs:814-829`). */
  def pgAdvanceSlot(slot: String, lsn: String): String =
    s"SELECT pg_replication_slot_advance('$slot', '$lsn')"

  /** K6 emptiness probe on the target
    * (reference: `src/adapter/clickhouse.rs:234-253`). */
  def chTableNonEmpty(database: String, table: String): String =
    s"select exists(select 1 from $database.$table)"

  /** CH column listing (reference: `src/adapter/clickhouse.rs:190-220`). */
  def chColumns(database: String, table: String): String =
    s"""SELECT name, type FROM system.columns
       |WHERE database = '$database' AND table = '$table'
       |ORDER BY position
       |""".stripMargin
}

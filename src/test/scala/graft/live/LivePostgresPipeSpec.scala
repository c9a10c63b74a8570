package graft.live

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.config.PipeConfig
import graft.decode.{PgOutputEncoder, PgValue}
import graft.sources.CatalogSql

/** THE full live-Postgres lifecycle — initialize (publication + slot +
  * target CREATE TABLE) → first_sync → sync_loop (peek → distributed
  * pgoutput decode → per-table routing → executing sink → slot advance) —
  * driven through `Main.runPostgresWith` end to end. The source client is
  * scripted: it answers the EXACT catalog SQL the pipe issues
  * (publication/slot probes, column/relation introspection) and serves
  * binary pgoutput frames from the same encoder the decoder round-trip
  * specs use; the target is REAL embedded Derby. Everything between the
  * two — the entire pipe — is production code.
  */
class LivePostgresPipeSpec extends AnyFunSuite with SparkTestBase {

  private val pub = "graft_spec_pub"
  private val slot = "graft_spec_slot"

  private def r(schema: StructType, values: Any*): Row =
    new GenericRowWithSchema(values.toArray, schema)

  /** Scripted PG: catalog answers + a pgoutput frame log addressed by
    * LSN, advanced only by `pg_replication_slot_advance`. */
  private class FakePg(
      tables: Map[String, Seq[(String, String, Boolean, Boolean)]], // table -> (col, udt, nullable, pk)
      frames: Seq[(Long, Array[Byte])] // (lsn-as-long, frame)
  ) extends JdbcClient(JdbcConnInfo("jdbc:fake:none")) {
    val executed = ArrayBuffer.empty[String]
    var published: Option[Set[(String, String)]] = None
    var slots: Set[String] = Set.empty
    var advancedTo: Long = 0L

    override def ping(): Boolean = true
    override def close(): Unit = ()

    private val colSchema = StructType(Seq(
      StructField("column_name", StringType), StructField("udt_name", StringType),
      StructField("is_nullable", BooleanType), StructField("ordinal_position", IntegerType),
      StructField("is_primary_key", BooleanType), StructField("comment", StringType)))
    private val relSchema = StructType(Seq(
      StructField("oid", LongType), StructField("nspname", StringType),
      StructField("relname", StringType)))
    private val peekSchema = StructType(Seq(
      StructField("lsn", StringType), StructField("xid", LongType),
      StructField("data", BinaryType)))
    private val oneColSchema = StructType(Seq(StructField("c", StringType)))
    private val pubTableSchema = StructType(Seq(
      StructField("schema_name", StringType), StructField("table_name", StringType)))

    override def query(sql: String): (StructType, Vector[Row]) = {
      val tableNames = tables.keys.toSeq.sorted
      val byColsSql = tableNames.map(t => CatalogSql.pgColumns("public", t) -> t).toMap
      val byRelSql = tableNames.map(t => CatalogSql.pgRelationIds("public", Seq(t)) -> t).toMap
      val byCommentSql = tableNames.map(t => CatalogSql.pgTableComment("public", t) -> t).toMap
      sql match {
        case s if byColsSql.contains(s) =>
          val t = byColsSql(s)
          (colSchema, tables(t).zipWithIndex.map { case ((n, udt, nul, pk), i) =>
            r(colSchema, n, udt, nul, i + 1, pk, "")
          }.toVector)
        case s if byRelSql.contains(s) =>
          val t = byRelSql(s)
          (relSchema, Vector(r(relSchema, 100L + tableNames.indexOf(t), "public", t)))
        case s if byCommentSql.contains(s) =>
          (oneColSchema, Vector(r(oneColSchema, s"comment for ${byCommentSql(s)}")))
        case s if s == CatalogSql.pgFindPublication(pub) =>
          (oneColSchema, published.toVector.map(_ => r(oneColSchema, pub)))
        case s if s == CatalogSql.pgPublicationTables(pub) =>
          (pubTableSchema, published.getOrElse(Set.empty).toVector
            .map { case (sch, t) => r(pubTableSchema, sch, t) })
        case s if s == CatalogSql.pgFindSlot(slot) =>
          (oneColSchema, slots.filter(_ == slot).toVector.map(r(oneColSchema, _)))
        case s if s.startsWith("SELECT lsn, xid, data") =>
          // non-consuming peek: everything still in the slot (> advancedTo)
          (peekSchema, frames.filter(_._1 > advancedTo).toVector.map { case (lsn, b) =>
            r(peekSchema, PgLsn.fromLong(lsn), 7L, b)
          })
        case other => fail(s"unexpected source SQL: $other")
      }
    }

    override def execute(sql: String): Unit = {
      executed += sql
      def parse(list: String) =
        list.split(",").map(_.trim.split('.')).map(a => (a(0), a(1))).toSet
      if (sql.startsWith(s"CREATE PUBLICATION $pub FOR TABLE "))
        published = Some(parse(sql.stripPrefix(s"CREATE PUBLICATION $pub FOR TABLE ")))
      else if (sql.startsWith(s"ALTER PUBLICATION $pub ADD TABLE "))
        published = Some(published.getOrElse(Set.empty) ++
          parse(sql.stripPrefix(s"ALTER PUBLICATION $pub ADD TABLE ")))
      else if (sql == CatalogSql.pgCreateSlot(slot)) slots += slot
      else if (sql.startsWith("SELECT pg_replication_slot_advance")) {
        val lsn = sql.split('\'')(3) // SELECT pg_replication_slot_advance('slot', 'LSN')
        advancedTo = PgLsn.toLong(lsn)
      } else fail(s"unexpected source statement: $sql")
    }
  }

  test("full lifecycle: publication+slot created, targets auto-created on Derby, frames synced, slot advanced") {
    val derbyUrl = "jdbc:derby:memory:livepg;create=true"
    val derby = new JdbcClient(JdbcConnInfo(derbyUrl))
    val tmp = java.nio.file.Files.createTempDirectory("graft-livepg").toString
    val cwdOffsets = new java.io.File(s"${graft.Main.offsetsDir}/$slot.offset")
    try {
      val fake = new FakePg(
        tables = Map(
          "users" -> Seq(("id", "int8", false, true), ("name", "text", true, false)),
          "orders" -> Seq(("id", "int8", false, true), ("total", "float8", true, false))),
        // rel ids follow the fake's sorted-name indexing: orders=100, users=101
        frames = Seq(
          1L -> PgOutputEncoder.insert(101L, Seq(PgValue.Text("1"), PgValue.Text("ada"))),
          2L -> PgOutputEncoder.insert(100L, Seq(PgValue.Text("10"), PgValue.Text("99.5"))),
          3L -> PgOutputEncoder.update(101L, Seq(PgValue.Text("1"), PgValue.Text("ada l."))),
          4L -> PgOutputEncoder.delete(100L, Seq(PgValue.Text("10"), PgValue.Null))))
      val cfg = PipeConfig.fromJson(
        s"""{
           |  "source": {"source_type": "postgres", "postgres": {
           |    "connection": {"host": "h", "port": 5432, "database": "d"},
           |    "publication_name": "$pub", "replication_slot_name": "$slot",
           |    "tables": [
           |      {"table_name": "orders", "skip_copy": true},
           |      {"table_name": "users", "skip_copy": true}]}},
           |  "target": {"target_type": "jdbc", "jdbc": {
           |    "url": "$derbyUrl", "database": "APP", "table": "unused",
           |    "dialect": "ansi"}}
           |}""".stripMargin)
      val pg = cfg.source.postgres.get

      graft.Main.runPostgresWith(spark, cfg, pg, fake,
        JdbcConnInfo(derbyUrl), "jdbc:postgresql://h:5432/d")

      // initialize: publication over BOTH tables + slot, created once
      assert(fake.published.contains(Set(("public", "orders"), ("public", "users"))))
      assert(fake.slots == Set(slot))
      // targets were auto-created from introspected source schema
      val users = derby.query("SELECT id, name FROM APP.users ORDER BY id")._2
      assert(users.map(row => (row.get(0), row.get(1))) == Vector((1L, "ada l.")))
      assert(derby.queryScalar("SELECT COUNT(*) FROM APP.orders")
        .map(_.toString.toLong).contains(0L)) // insert then delete
      // the slot advanced to the batch max AFTER all writes
      assert(fake.advancedTo == 4L)
      // drained: a re-peek sees an empty slot
      assert(fake.executed.count(_.startsWith("SELECT pg_replication_slot_advance")) >= 1)
    } finally {
      derby.close()
      cwdOffsets.delete()
    }
  }

  test("re-run against the already-initialized world is a no-op initialize (idempotence)") {
    val derbyUrl = "jdbc:derby:memory:livepg2;create=true"
    val derby = new JdbcClient(JdbcConnInfo(derbyUrl))
    val cwdOffsets = new java.io.File(s"${graft.Main.offsetsDir}/$slot.offset")
    try {
      val mkFake = () => new FakePg(
        tables = Map("users" -> Seq(("id", "int8", false, true), ("name", "text", true, false))),
        frames = Seq(1L -> PgOutputEncoder.insert(100L, Seq(PgValue.Text("1"), PgValue.Text("ada")))))
      val cfg = PipeConfig.fromJson(
        s"""{
           |  "source": {"source_type": "postgres", "postgres": {
           |    "connection": {"host": "h", "port": 5432, "database": "d"},
           |    "publication_name": "$pub", "replication_slot_name": "$slot",
           |    "tables": [{"table_name": "users", "skip_copy": true}]}},
           |  "target": {"target_type": "jdbc", "jdbc": {
           |    "url": "$derbyUrl", "database": "APP", "table": "unused",
           |    "dialect": "ansi"}}
           |}""".stripMargin)
      val pg = cfg.source.postgres.get
      val first = mkFake()
      graft.Main.runPostgresWith(spark, cfg, pg, first,
        JdbcConnInfo(derbyUrl), "url")

      // second run: world already initialized (publication, slot, target
      // table, synced rows) — no CREATE/ALTER re-issued, state unchanged
      val second = mkFake()
      second.published = first.published
      second.slots = first.slots
      second.advancedTo = first.advancedTo
      graft.Main.runPostgresWith(spark, cfg, pg, second,
        JdbcConnInfo(derbyUrl), "url")
      assert(!second.executed.exists(s =>
        s.startsWith("CREATE PUBLICATION") || s.startsWith("ALTER PUBLICATION") ||
          s.startsWith(s"SELECT pg_create_logical_replication_slot")))
      assert(derby.queryScalar("SELECT COUNT(*) FROM APP.users")
        .map(_.toString.toLong).contains(1L))
    } finally {
      derby.close()
      cwdOffsets.delete()
    }
  }
}

package graft.live

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.decode.{PgOutputDecoder, PgValue}
import graft.pipe.CdcSource
import graft.sources.CatalogSql

/** Live JDBC CDC source over any endpoint exposing a seq-addressed
  * changelog: the peek is a bounded, non-consuming `SELECT … WHERE seq >
  * :after ORDER BY seq FETCH FIRST :limit ROWS ONLY`, the exact protocol of
  * `pg_logical_slot_peek_binary_changes` (reference:
  * `src/adapter/postgres.rs:787-812`) generalized to a SQL template.
  *
  * Template placeholders: `{after}`, `{limit}`. Each peek materializes ≤
  * `peek_changes_limit` rows on the driver (one slot conversation, like the
  * reference), then distributes them as a DataFrame.
  *
  * VISIBILITY CONTRACT: the peek protocol assumes `seq` becomes visible in
  * COMMIT order — true by construction for a replication slot (the WAL is
  * commit-ordered), NOT automatically true for a plain changelog table
  * written by concurrent transactions. There, a row with seq n can commit
  * (and become visible) AFTER seq n+1 was already peeked and its offset
  * committed — that row is then skipped forever, because every later peek
  * starts above n. Either guarantee commit-ordered seq assignment at the
  * endpoint (e.g. assign seq from a post-commit sequencer or a single
  * writer), or peek behind a stability watermark —
  * [[JdbcChangelogSource.tablePeekSql]]'s `stabilityHorizon` bounds each
  * peek at `max(seq) - horizon`, so a transaction is safe as long as it
  * commits before `horizon` later seqs do.
  *
  * The snapshot (S1) does NOT go through the single client: it uses Spark's
  * own partitioned JDBC scan (`spark.read.jdbc`), so the bulk copy runs on
  * executors with pushdown — the Spark-native answer to the reference's
  * `COPY TO STDOUT` streaming copy (`src/adapter/postgres.rs:334-477`).
  */
class JdbcChangelogSource(
    client: JdbcClient,
    peekSqlTemplate: String,
    snapshotFn: () => DataFrame,
    seqCol: String = "seq"
)(implicit spark: SparkSession) extends CdcSource {

  override def snapshot(): DataFrame = snapshotFn()

  override def peekChanges(after: Long, limit: Long): DataFrame = {
    val df = client.queryDf(spark,
      peekSqlTemplate
        .replace("{after}", after.toString)
        .replace("{limit}", limit.toString))
    // the pipe envelope is hard-named "seq" (CdcSource.maxSeq, the pipes'
    // aligned selects): normalize a custom seq column to it
    if (seqCol == "seq") df else df.withColumnRenamed(seqCol, "seq")
  }
}

object JdbcChangelogSource {
  /** Standard SQL peek over a changelog table (runs on any ANSI endpoint;
    * the integration spec drives it against embedded Derby).
    *
    * `stabilityHorizon > 0` guards against non-commit-ordered seq
    * visibility (see the class scaladoc): the peek reads only up to
    * `max(seq) - horizon`, leaving the newest `horizon` seqs as an
    * in-flight buffer for transactions that allocated a seq but have not
    * committed yet. They are picked up by a later peek once the watermark
    * passes them. 0 (the default) keeps the exact slot-peek protocol and
    * REQUIRES commit-ordered seq. */
  def tablePeekSql(
      table: String, seqCol: String = "seq", stabilityHorizon: Long = 0L): String =
    if (stabilityHorizon <= 0L)
      s"SELECT * FROM $table WHERE $seqCol > {after} ORDER BY $seqCol FETCH FIRST {limit} ROWS ONLY"
    else
      s"SELECT * FROM $table WHERE $seqCol > {after} AND $seqCol <= " +
        s"(SELECT MAX($seqCol) - $stabilityHorizon FROM $table) " +
        s"ORDER BY $seqCol FETCH FIRST {limit} ROWS ONLY"

  /** Partitioned executor-side snapshot scan of a JDBC table. With a
    * numeric PK the scan splits into `numPartitions` range predicates —
    * the 100 TB shape; without one it degrades to a single partition.
    * Column names fold to lowercase (endpoints that store unquoted
    * identifiers uppercase — Derby, Oracle — would otherwise miss the
    * case-sensitive target alignment). */
  def snapshotScan(
      spark: SparkSession, info: JdbcConnInfo, table: String,
      partitionCol: Option[String] = None, numPartitions: Int = 8): () => DataFrame =
    () => {
      def lowered(df: DataFrame): DataFrame =
        df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
      val base = spark.read.format("jdbc")
        .option("url", info.url)
        .option("dbtable", table)
        .option("user", info.user)
        .option("password", info.password)
      val withDriver = info.driver.fold(base)(d => base.option("driver", d))
      partitionCol match {
        case Some(pc) =>
          // bounds probe is two scalar reads on the driver client
          val probe = new JdbcClient(info)
          try {
            val (lo, hi) = probe.query(s"SELECT MIN($pc), MAX($pc) FROM $table")._2.headOption
              .map(r => (Option(r.get(0)), Option(r.get(1))))
              .getOrElse((None, None))
            (lo, hi) match {
              case (Some(l), Some(h)) =>
                lowered(withDriver
                  .option("partitionColumn", pc)
                  .option("lowerBound", l.toString)
                  .option("upperBound", h.toString)
                  .option("numPartitions", numPartitions.toString)
                  .load())
              case _ => lowered(withDriver.load())
            }
          } finally probe.close()
        case None => lowered(withDriver.load())
      }
    }
}

/** One replicated relation as seen by the pgoutput decoder: the positional
  * column list the tuples index into (reference: relation-id ↔ table map,
  * `src/adapter/postgres.rs:110-156`, cached per pipe
  * `src/pipes/postgres.rs:25-28`). */
case class PgRelation(relationId: Long, table: String, columns: Seq[String])
    extends Serializable

/** Live Postgres logical-replication source: peeks binary pgoutput frames
  * through JDBC (`pg_logical_slot_peek_binary_changes`), decodes them with
  * [[PgOutputDecoder]] ON EXECUTORS, and yields a per-table-routable
  * changelog DataFrame `(seq, op, table, cols array<string>)`.
  *
  * The peek conversation (one bounded query per iteration) is the driver
  * client's; everything downstream — frame decode, TOAST resolution,
  * column alignment, casts — distributes. Offsets are LSNs mapped to the
  * pipe's Long seq via [[PgLsn]]; the commit point is
  * `pg_replication_slot_advance` (reference: `postgres.rs:814-829`),
  * issued AFTER the sink write succeeds (at-least-once).
  */
class PgOutputJdbcSource(
    client: JdbcClient,
    slot: String,
    publication: String,
    relations: Seq[PgRelation],
    snapshotDf: () => DataFrame
)(implicit spark: SparkSession) extends CdcSource {

  override def snapshot(): DataFrame = snapshotDf()

  override def peekChanges(after: Long, limit: Long): DataFrame = {
    val raw = client.queryDf(spark, CatalogSql.pgPeekChanges(slot, publication, limit))
    // peek returns everything still in the slot; the seq > after guard is
    // ours (the slot is advanced only at commit, so a crashed batch replays).
    // LSN "hi/lo" hex → (hi << 32) | lo, in native (codegen'd) expressions.
    val parts = split(col("lsn").cast(StringType), "/")
    val lsnSeq = shiftleft(conv(parts.getItem(0), 16, 10).cast(LongType), 32)
      .bitwiseOR(conv(parts.getItem(1), 16, 10).cast(LongType))
    val decoded = PgOutputJdbcSource.decodeFrames(
      raw.withColumn("seq", lsnSeq), relations)
    decoded.filter(col("seq") > after).orderBy(col("seq"))
  }

  /** Commit the cursor — the at-least-once point (K6 analogue: only after
    * a successful sink write). */
  def advance(toSeq: Long): Unit =
    client.execute(CatalogSql.pgAdvanceSlot(slot, PgLsn.fromLong(toSeq)))
}

object PgOutputJdbcSource {
  /** Decode `(seq, data binary)` frames to changelog rows, distributed.
    * Skipped frames (Begin/Commit/Origin/Relation/Type) drop; unknown
    * relation ids warn-and-skip like the reference
    * (`src/pipes/postgres.rs:316-326`). */
  def decodeFrames(frames: DataFrame, relations: Seq[PgRelation]): DataFrame = {
    val spark = frames.sparkSession
    val relMap = spark.sparkContext.broadcast(relations.map(r => r.relationId -> r).toMap)
    val outSchema = StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("cols", ArrayType(StringType, containsNull = true), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    frames.select(col("seq"), col("data")).flatMap { row =>
      val seq = row.getLong(0)
      val bytes = row.getAs[Array[Byte]](1)
      PgOutputDecoder.decode(bytes).flatMap { msg =>
        relMap.value.get(msg.relationId).map { rel =>
          val values: Seq[String] =
            if (msg.messageType == 'T') Seq.fill(rel.columns.size)(null)
            else msg.payload.map {
              case PgValue.Text(v) => v
              case _               => null // Null / resolved-TOAST-miss
            }.padTo(rel.columns.size, null: String)
          Row(seq, msg.messageType.toString, rel.table, values)
        }
      }
    }(enc)
  }

  /** Project one table's slice of the decoded changelog into named string
    * columns (positional, like the reference's tuple-to-column zip). */
  def tableSlice(decoded: DataFrame, rel: PgRelation): DataFrame =
    decoded.filter(col("table") === rel.table)
      .select(
        Seq(col("seq"), col("op")) ++
          rel.columns.zipWithIndex.map { case (n, i) =>
            element_at(col("cols"), i + 1).as(n)
          }: _*)

  /** All relations' slices in ONE DataFrame (union schema, missing
    * columns null), keeping the `table` routing column — the shape
    * [[graft.pipe.MultiTablePipe]] consumes. The whole peeked batch is
    * decoded once and every table's events survive; per-table pipes over
    * a shared replication slot would instead drop the other tables'
    * frames on the floor when the slot advances. */
  def multiTableSlices(decoded: DataFrame, relations: Seq[PgRelation]): DataFrame =
    relations.map { rel =>
      tableSlice(decoded, rel).withColumn("table", lit(rel.table))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
}

/** PG LSN ↔ 64-bit mapping: `hi/lo` hex text is `(hi << 32) | lo`. */
object PgLsn {
  def toLong(lsn: String): Long = {
    val Array(hi, lo) = lsn.split("/")
    (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
  }
  def fromLong(seq: Long): String =
    f"${seq >>> 32}%X/${seq & 0xFFFFFFFFL}%X"
}

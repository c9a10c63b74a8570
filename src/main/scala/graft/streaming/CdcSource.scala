package graft.streaming

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource-v2 streaming surface of the CDC peek (SURVEY.md sec 2.1 S2):
  * `spark.readStream.format("graft.streaming.CdcSourceProvider")` over a
  * seq-ordered changelog parquet, with `maxEventsPerTrigger` playing the
  * reference's `peek_changes_limit` (65,536 default — `src/config.rs:146-149`)
  * via admission control, so each micro-batch is one bounded WAL peek.
  *
  * The WAL window is materialized on the driver at stream start — the
  * exact analogue of the reference's peek protocol, which drains a single
  * replication-slot connection on its coordinator (a per-trigger slice is
  * ≤ the peek limit by construction). Executors receive their partition's
  * slice of each batch. A live Postgres implementation would swap the
  * parquet load for `pg_logical_slot_peek_binary_changes` and keep every
  * other piece (offsets, admission control, partitioning) unchanged.
  *
  * Options: `path` (parquet file/dir), `seqCol` (default "seq"),
  * `maxEventsPerTrigger` (default 65536), `numPartitions` (default 4).
  */
class CdcSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcTable(schema,
      properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

private[streaming] class CdcTable(schema: StructType, options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-cdc(${options.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(schema, options)
        override def toBatch: Batch = // batch read = the full snapshot window
          new CdcBatch(schema, options)
      }
    }
}

/** Offset = high-watermark of the seq column (LSN analogue). */
private[streaming] case class CdcOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private[streaming] class CdcMicroBatchStream(
    schema: StructType, options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val limit = options.getOrElse("maxeventspertrigger", "65536").toLong
  private val numPartitions = options.getOrElse("numpartitions", "4").toInt

  // Driver-side WAL window, seq-sorted (see class doc for why driver-side
  // is the faithful shape here). UnsafeRow copies are compact + serializable.
  private lazy val rows: Array[(Long, InternalRow)] =
    CdcSourceData.load(schema, options)

  // Trigger.AvailableNow: pin the drain target so the engine keeps firing
  // bounded micro-batches (peek-limit-sized) until the log is caught up —
  // without this the trigger degrades to one all-available batch.
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(rows.lastOption.map(_._1).getOrElse(Long.MinValue))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(limit)

  override def initialOffset(): Offset = CdcOffset(Long.MinValue)
  override def deserializeOffset(json: String): Offset = CdcOffset(json.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, readLimit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcOffset].seq
    val max = readLimit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => rl.maxRows()
      case _ => Long.MaxValue
    }
    val pending = rows.iterator
      .filter { case (s, _) => s > from && availableNowTarget.forall(s <= _) }
      .take(math.min(max, Int.MaxValue).toInt).toArray
    if (pending.isEmpty) start else CdcOffset(pending.last._1)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdcOffset].seq
    val to = end.asInstanceOf[CdcOffset].seq
    val slice = rows.filter { case (s, _) => s > from && s <= to }.map(_._2)
    slice.grouped(math.max(1, (slice.length + numPartitions - 1) / numPartitions))
      .map(chunk => CdcInputPartition(chunk): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val it = partition.asInstanceOf[CdcInputPartition].rows.iterator
          private var current: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { current = it.next(); true } else false
          override def get(): InternalRow = current
          override def close(): Unit = ()
        }
    }

  override def commit(end: Offset): Unit = () // peek does not consume (S2)
  override def stop(): Unit = ()
}

private[streaming] case class CdcInputPartition(rows: Array[InternalRow])
    extends InputPartition

/** Batch-read form of the same window (lets the source double as the
  * snapshot scan in `spark.read`). */
private[streaming] class CdcBatch(schema: StructType, options: Map[String, String])
    extends Batch {
  private lazy val rows = CdcSourceData.load(schema, options).map(_._2)
  override def planInputPartitions(): Array[InputPartition] =
    Array(CdcInputPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val it = partition.asInstanceOf[CdcInputPartition].rows.iterator
          private var current: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { current = it.next(); true } else false
          override def get(): InternalRow = current
          override def close(): Unit = ()
        }
    }
}

private[streaming] object CdcSourceData {
  /** Load the seq-ordered window as (seq, UnsafeRow) pairs. */
  def load(schema: StructType, options: Map[String, String]): Array[(Long, InternalRow)] = {
    val spark = SparkSession.active
    val path = options("path")
    val seqCol = options.getOrElse("seqcol", "seq")
    val df = spark.read.schema(schema).parquet(path)
    val seqIdx = schema.fieldIndex(seqCol)
    // The copy MUST happen inside the executors: toRdd rows are reused
    // buffers, so collecting without a per-row copy yields N references
    // to one mutable row. WAL order is then re-established on the driver
    // (scan partition order is not the written order).
    df.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()))
      .collect()
      .map(row => (row.getLong(seqIdx), row))
      .sortBy(_._1)
  }
}

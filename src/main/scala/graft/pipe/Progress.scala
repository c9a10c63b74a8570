package graft.pipe

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Percent-progress reporting for the bulk snapshot copy (EP2), the
  * analogue of the reference's redraw-in-place progress logger
  * (`/root/reference/src/logger.rs:25-46`, driven per copy batch from
  * `src/adapter/postgres.rs:420-442`). The denominator is a row ESTIMATE
  * (S6) — progress only, never correctness, exactly like the reference's
  * `reltuples` probe.
  */
class ProgressLogger(
    total: Long,
    out: String => Unit = s => System.err.println(s),
    label: String = "copy") {

  private val done = new AtomicLong(0L)
  private val lastPct = new AtomicInteger(-1)

  /** Record `n` more rows; emits one line per percent step, monotone
    * non-decreasing, concurrency-safe (executors' task-end events arrive
    * on the listener bus thread but keep this reusable). */
  def add(n: Long): Unit = {
    val d = done.addAndGet(n)
    val pct =
      if (total <= 0L) 100
      else math.min(100L, d * 100L / total).toInt
    var prev = lastPct.get()
    var won = false
    while (pct > prev && !won) {
      if (lastPct.compareAndSet(prev, pct)) won = true
      else prev = lastPct.get()
    }
    if (won) out(s"[$label] $pct% ($d/$total rows)")
  }

  def percent: Int = math.max(0, lastPct.get())
}

/** SparkListener that feeds a [[ProgressLogger]] from task output metrics:
  * every finished write task contributes its `recordsWritten`, so percent
  * lines appear WHILE the distributed copy runs — not after the action
  * returns. Register around the copy, then remove. */
class SnapshotProgressListener(logger: ProgressLogger) extends SparkListener {
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val n = Option(taskEnd.taskMetrics)
      .map(_.outputMetrics.recordsWritten).getOrElse(0L)
    if (n > 0) logger.add(n)
  }
}

object Progress {
  /** Run `body` (a distributed write) with task-level copy progress wired
    * to `out`. `totalEstimate` is the S6 row estimate. */
  def withCopyProgress[A](
      spark: SparkSession, totalEstimate: Long,
      out: String => Unit, label: String = "copy")(body: => A): A = {
    val logger = new ProgressLogger(totalEstimate, out, label)
    val listener = new SnapshotProgressListener(logger)
    spark.sparkContext.addSparkListener(listener)
    try body
    finally {
      // drain pending bus events so late task-ends still count, then detach
      org.apache.spark.GraftListenerShim.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Wall-clock discipline (r15 lesson: the driver's correctness artifact
  * came back EMPTY because the gate outgrew its budget): the dump must
  * stay cheap as the query count grows, so
  *   - the session is local[32] (r1's local[4] default was never
  *     resized; Bench has run local[32] at the same heap since r7), and
  *   - queries dump CONCURRENTLY from a small worker pool under FAIR
  *     scheduling — every gate builds its own DataFrame, mints its own
  *     temp dirs, and never touches session conf (audited r16), so the
  *     only shared state is the SparkSession, which is thread-safe by
  *     contract. FAIR keeps one slow composite (curate triggers, IVF
  *     builds) from head-of-line-blocking the dozens of sub-second
  *     gates behind it.
  * Per-query wall times go to stderr (`[verify-time] name sec`) so a
  * budget regression is diagnosable from the driver log alone. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only the named queries (local triage —
    // the driver always passes exactly two args, so its gate still dumps
    // everything)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .toSeq
    val workers = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt
      .max(1).min(todo.size.max(1))
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    todo.foreach(queue.add)
    val threads = (1 to workers).map { w =>
      val t = new Thread(() => {
        // one FAIR pool PER WORKER: without this, every job lands in the
        // single default pool, whose internal order is FIFO — a slow
        // composite would still head-of-line-block the queue (pools are
        // created on demand with equal weight; local properties are
        // thread-scoped, so each worker's jobs share its pool)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"verify-$w")
        var next = queue.poll()
        while (next != null) {
          val (name, fn) = next
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(
              f"[verify-time] $name ${(System.nanoTime() - t0) / 1e9}%.2f")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          next = queue.poll()
        }
      })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

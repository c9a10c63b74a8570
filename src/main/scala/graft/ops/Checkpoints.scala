package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The lineage-pin seam for iterative and micro-batch operators
  * (`clusterPairs` label rounds, BPE merge rounds, CDC fold state,
  * streaming near-dedup batches, DSIR bucket counts).
  *
  * Default (`spark.graft.checkpointDir` unset): `localCheckpoint` —
  * executor-local blocks, zero I/O beyond memory/disk spill, exactly
  * right on `local[*]` and for short-lived jobs. The catch on a REAL
  * cluster: local checkpoint blocks live only on their executor, so an
  * executor loss mid-iteration kills the job instead of recomputing
  * (an availability concern, not correctness — the job fails loudly).
  *
  * Cluster runs set `spark.conf.set("spark.graft.checkpointDir",
  * "hdfs://…/ckpt")` (or any HDFS-compatible URI): every pin site then
  * uses RELIABLE `Dataset.checkpoint`, which persists to the shared
  * filesystem and survives executor loss at the cost of one write+read
  * per pin. One config flips every operator — no per-call plumbing.
  */
object Checkpoints {

  /** Session conf key; when set, pins use reliable checkpointing into
    * this directory. */
  val ConfKey = "spark.graft.checkpointDir"

  private def reliableDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(ConfKey).filter(_.nonEmpty)

  /** True when pins in this session write reliable checkpoints. */
  def isReliable(spark: SparkSession): Boolean = reliableDir(spark).isDefined

  /** The configured dir LAST passed to `setCheckpointDir` on this JVM.
    * `SparkContext.getCheckpointDir` cannot serve as the set-once guard:
    * it returns `<dir>/<random-uuid>` (the context appends a UUID
    * subdirectory on every set), so comparing it against the configured
    * value never matches and every pin would mint a fresh UUID dir —
    * thousands of scattered checkpoint directories over a long
    * iterative run. One SparkContext per JVM in every supported
    * deployment, so a plain volatile is enough. */
  @volatile private var appliedDir: Option[String] = None

  /** Census observer seam ([[graft.Explain]]): composed queries pin
    * stages EAGERLY at plan construction, so their work is invisible to
    * a census that only walks the final DataFrame's plan. When set,
    * every pin first hands its (not-yet-truncated) DataFrame to the
    * observer, which tallies the stage's scans/exchanges; stages + final
    * plan sum to the composition's true census without double-counting
    * (each stage's lineage ends at the previous pins' checkpoint RDDs).
    * Tool-side; never part of the operator contract. Thread-LOCAL so a
    * census never observes pins from concurrent threads (a Spark job
    * running in parallel with the census would otherwise be mis-tallied
    * into it), and nested [[withObserver]] scopes restore the enclosing
    * observer instead of clearing it. */
  private val observer = new scala.util.DynamicVariable[Option[DataFrame => Unit]](None)

  /** Run `body` with every [[pin]] ON THIS THREAD reporting its input
    * frame to `f`; the prior observer (if any) is restored on exit. */
  def withObserver[A](f: DataFrame => Unit)(body: => A): A =
    observer.withValue(Some(f))(body)

  /** Materialize `df` once and truncate its lineage: reliable
    * `checkpoint` when [[ConfKey]] is set, `localCheckpoint` otherwise.
    * Always eager — every call site pins state that later stages (or a
    * side effect between them) must see exactly once. */
  def pin(df: DataFrame): DataFrame = {
    observer.value.foreach(_(df))
    val spark = df.sparkSession
    reliableDir(spark) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!appliedDir.contains(dir) || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          appliedDir = Some(dir)
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession

/** Driver-side vs job-based file listing for partitioned catalog reads
  * (r17 optimization, guide §6 small-files/listing + §1.2 "remove work
  * that buys nothing").
  *
  * Building a relation over more than
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` paths
  * (default 32) makes Spark list them with a DISTRIBUTED JOB. Every
  * catalog in this repo is a bucket-partitioned directory tree
  * (64-1024 dirs), so each per-trigger probe read was paying that job
  * — measured ~1.9-2.4 s of pure scheduling overhead per trigger on
  * the bench's 1024-bucket catalogs, where a sequential driver-side
  * listing of the same dirs takes milliseconds on a local or
  * HDFS-like filesystem.
  *
  * The threshold is the RIGHT knob (not a reimplementation of the
  * listing): raising it for the duration of relation construction
  * flips Spark to its own driver-side sequential listing, identical
  * semantics, no job. Scale story: on object stores with
  * high-latency LIST calls a distributed listing genuinely wins once
  * the directory count is large, so the crossover stays an
  * environment parameter — `SPARK_GRAFT_LIST_PARALLEL_THRESHOLD`
  * (paths), default 8192: catalogs up to 8192 bucket dirs list on the
  * driver; deployments on S3-like stores set it back down (e.g. 32).
  *
  * Scoped set/restore rather than a session-wide constant so the knob
  * never leaks into user queries reading genuinely huge partitioned
  * tables. Concurrent readers racing the toggle see only a perf
  * effect (their listing runs on the driver or in a job), never a
  * semantic one.
  */
object Listing {

  private val Key = "spark.sql.sources.parallelPartitionDiscovery.threshold"

  private val Threshold: String =
    sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "8192")

  /** Run `body` (which should CONSTRUCT a file relation — listing is
    * eager at construction) with driver-side listing up to
    * [[Threshold]] paths. */
  def driverSide[A](spark: SparkSession)(body: => A): A = {
    val old = spark.conf.getOption(Key)
    spark.conf.set(Key, Threshold)
    try body
    finally old match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }
}

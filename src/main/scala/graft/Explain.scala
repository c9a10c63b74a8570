package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of each declared
  * query so shuffle count, pushed filters, pruned schemas, broadcast
  * choices and whole-stage-codegen spans can be reviewed per round.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  *        runMain graft.Explain census [sfDir]   — emit the markdown
  *        shuffle/broadcast/pushdown table for docs/PLANS_r{N}.md, so the
  *        plan census is generated, never hand-tallied.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val census = args.headOption.contains("census")
    val rest = if (census) args.drop(1) else args
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static plans: exchanges visible in executedPlan without the AQE
      // wrapper (AQE only re-plans at runtime; the census is about shape)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (census) {
      println("| query | parquet scans | shuffle exchanges | broadcasts | scans w/ pushed filters |")
      println("|---|---|---|---|---|")
      names.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          println(censusRow(name, fn(spark, sfDir)))
        }
      }
    } else names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n================ $name ================")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }

  private case class PlanStats(
      scans: Int, shuffles: Int, broadcasts: Int, pushed: Int) {
    def +(o: PlanStats): PlanStats = PlanStats(
      scans + o.scans, shuffles + o.shuffles,
      broadcasts + o.broadcasts, pushed + o.pushed)
  }

  /** Scan/exchange/pushdown counts of one plan, on the (non-AQE)
    * `executedPlan`: `EnsureRequirements` has inserted the exchanges,
    * and `PushedFilters` is read untruncated from scan metadata — plan
    * toString elides the list. */
  private def stats(df: org.apache.spark.sql.DataFrame): PlanStats = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(walk)
    val nodes = walk(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    PlanStats(
      scans.length,
      nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      scans.count(s =>
        s.metadata.get("PushedFilters").exists(v => v != "[]" && v.nonEmpty)))
  }

  /** One markdown census row. `mk` is by-name: composed queries execute
    * [[graft.ops.Checkpoints.pin]] stages EAGERLY while the query is
    * constructed, so construction runs under a pin observer and each
    * pinned stage's plan is tallied alongside the final frame's — the
    * row is the composition's TRUE census, not just its last stage
    * (stages end at earlier pins' checkpoint RDDs, so nothing
    * double-counts). */
  def censusRow(name: String, mk: => org.apache.spark.sql.DataFrame): String = {
    var pinned = PlanStats(0, 0, 0, 0)
    val df = graft.ops.Checkpoints.withObserver(d => pinned = pinned + stats(d))(mk)
    val t = pinned + stats(df)
    s"| $name | ${t.scans} | ${t.shuffles} | ${t.broadcasts} | ${t.pushed} |"
  }
}

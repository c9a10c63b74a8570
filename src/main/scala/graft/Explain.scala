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

  /** One markdown census row, counted on the (non-AQE) `executedPlan`:
    * `EnsureRequirements` has inserted the exchanges, and `PushedFilters`
    * is read untruncated from scan metadata — plan toString elides the
    * list. */
  def censusRow(name: String, df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(walk)
    val nodes = walk(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    val broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
    val pushed = scans.count(s =>
      s.metadata.get("PushedFilters").exists(v => v != "[]" && v.nonEmpty))
    s"| $name | ${scans.length} | $shuffles | $broadcasts | $pushed |"
  }
}

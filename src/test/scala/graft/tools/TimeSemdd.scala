package graft.tools
object TimeSemdd {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("semdedup_incremental")(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.functions._
import graft.sim.{IvfIndex, Similarity}

/** Measures the persistent IVF-PQ leg's mean recall@10 vs brute force at
  * each test SF — the numbers behind `SparkEntry.IvfPqRecallFloor`. Run
  * with `sbt "Test/runMain graft.tools.IvfPqProbe"` when re-tuning. */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("0.001", "0.01")
    for (sf <- sfs) {
      val e = graft.sources.Tables.read(spark, s"/root/testdata/sf$sf", "embeddings")
      // denser query set than the gate query's %100 (tri-scale nq of
      // 5/5/20 is too noisy to adjudicate scheme changes)
      val q = e.filter(col("vec_id") % 20 === 0)
      val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val nq = q.count()
      for (pqK <- Seq(16, 64); residual <- Seq(true, false)) {
        val dir = java.nio.file.Files.createTempDirectory("ivfpq-probe").toString + "/idx"
        IvfIndex.build(e, "vec_id", "embedding", dir, nLists = 8)
        IvfIndex.buildPq(spark, dir, m = 16, k = pqK, residual = residual)
        val approx = IvfIndex.topKPq(spark, dir, q, "vec_id", "embedding",
          k = 10, nProbe = 3, rerank = 50)
        val hits = approx.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id")).count()
        println(f"sf$sf k=$pqK residual=$residual recall@10=${hits.toDouble / (nq * 10)}%.4f nq=$nq")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}

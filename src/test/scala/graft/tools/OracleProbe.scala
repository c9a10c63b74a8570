package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not a test): prints the round-8 contract-query outputs
  * and the underlying mean recalls at each SF, to pick/verify floors. */
object OracleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      println(s"===== $dir =====")
      val e = graft.sources.Tables.read(spark, dir, "embeddings")
      println(s"corpus rows: ${e.count()}, queries: ${e.filter(col("vec_id") % 100 === 0).count()}")
      for (name <- Seq("embed_topk_ivf", "embed_topk_pq", "kmeans_topics", "semdedup_report")) {
        val t0 = System.nanoTime()
        val out = graft.SparkEntry.queries(name)(spark, dir)
        val rows = out.collect()
        println(f"$name%-18s rows=${rows.length} ${(System.nanoTime() - t0) / 1e9}%.2fs")
        rows.take(5).foreach(r => println(s"  $r"))
      }
      // raw mean recalls (not emitted by the queries)
      import graft.sim.Similarity
      val q = e.filter(col("vec_id") % 100 === 0)
      val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"))
      def meanRecall(approx: org.apache.spark.sql.DataFrame): Double = {
        val hits = approx.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id")).count()
        hits.toDouble / exact.count()
      }
      val cents = Similarity.ivfTrainAuto(e, "embedding", nLists = 8)
      println(f"  ivf mean recall@10: ${meanRecall(Similarity.ivfTopKTrained(e, q, "vec_id", "embedding", 10, cents, nProbe = 3))}%.3f")
      val model = graft.sim.Pq.train(e, "embedding", m = 16, k = 16)
      println(f"  pq  mean recall@10: ${meanRecall(graft.sim.Pq.topK(e, q, "vec_id", "embedding", model, 10, rerank = 50))}%.3f")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.functions._
import graft.sim.{IvfIndex, Pq, Similarity}

/** Measures mean recall@10 of the trained-ANN gate queries at their
  * EXACT gate configuration — the RAW embeddings corpus (no planted
  * rows: the gate queries run on `emb(s, dir)` as-is), the gate's
  * `vec_id % 100 = 0` query set, and the gate's probe counts and
  * codebook sizes (`SparkEntry`'s `embed_topk_ivf[_indexed]` /
  * `embed_topk_pq` / `embed_topk_ivfpq_indexed`) — the numbers the
  * recall FLOORS are set from. Run with
  * `sbt "Test/runMain graft.tools.GateRecallProbe"` when re-tuning;
  * [[IvfPqProbe]] stays the denser-query scheme-change adjudicator. */
object GateRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("0.001", "0.01", "0.1")
    for (sf <- sfs) {
      val e = graft.sources.Tables.read(spark, s"/root/testdata/sf$sf", "embeddings")
        .select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") % 100 === 0)
      val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val nq = q.count()
      def recall(approx: org.apache.spark.sql.DataFrame): Double =
        approx.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id")).count().toDouble / (nq * 10)

      val centroids = Similarity.ivfTrainAuto(e, "embedding", nLists = 8)
      val rIvf = recall(Similarity.ivfTopKTrained(
        e, q, "vec_id", "embedding", k = 10, centroids, nProbe = 3))

      val model = Pq.train(e, "embedding", m = 16, k = 16)
      val rPq = recall(Pq.topK(e, q, "vec_id", "embedding", model, k = 10,
        rerank = 50))

      val dir = java.nio.file.Files.createTempDirectory("gate-probe").toString + "/idx"
      IvfIndex.build(e, "vec_id", "embedding", dir, nLists = 8)
      val rIdx = recall(IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
        k = 10, nProbe = 3))
      IvfIndex.buildPq(spark, dir, m = 16, k = 64)
      val rIvfPq = recall(IvfIndex.topKPq(spark, dir, q, "vec_id", "embedding",
        k = 10, nProbe = 3, rerank = 50))
      println(f"sf$sf nq=$nq ivf=$rIvf%.4f ivf_indexed=$rIdx%.4f " +
        f"pq=$rPq%.4f ivfpq=$rIvfPq%.4f")
      exact.unpersist()
    }
    spark.stop()
  }
}

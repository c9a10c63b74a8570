package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{CdcApply, Changelog}
import graft.ops.CoreOps
import graft.sources.Tables

/** Per-round benchmark: headline declared queries + the BASELINE.md
  * throughput metrics (snapshot rows/s, CDC events/s, dedup overhead),
  * printed as ONE JSON line. Work is forced with the `noop` sink so
  * column computation cannot be pruned the way a bare count() allows.
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM/codegen paths once with a tiny action
    Tables.read(spark, sfDir, "region").count()

    val headline = Seq(
      "cdc_user_state", "q1_agg", "q3_join", "q5_region",
      "q6_selective", "q18_large_orders", "q4_priority", "q14_promo", "q10_returns",
      "q7_volume", "q8_mktshare", "q13_custdist", "q15_top_supplier",
      "q17_small_qty", "q19_disc_revenue", "q21_waiting", "q22_opportunity",
      "q2_min_cost", "q9_profit", "q11_important_value", "q12_late_priority",
      "q16_supplier_cnt", "q20_excess_supplier",
      "dedup_exact_docs", "dedup_incremental", "minhash_pairs", "simhash_docs",
      "embed_topk", "embed_topk_lsh", "embed_topk_ivf", "embed_topk_q8",
      "semdedup_report",
      "text_metrics", "rep_ratios", "decontam_overlap", "bm25_topk",
      "doc_fingerprint", "curate_docs", "asof_click_purchase",
      "sessionize", "source_profile",
      "span_dedup", "pack_plan", "mixture_sample", "quality_select",
      "top_ngrams", "url_normalize", "domain_stats", "media_dims",
      "wav_meta", "vocab_encode", "unigram_logppl", "kmeans_topics",
      "chunk_docs", "ppl_hist", "bpe_merges", "embed_topk_pq",
      "dedup_incremental_bloom", "format_roundtrip", "corpus_sketch",
      "window_agg", "stratified_split", "gopher_filters",
      "html_extract", "dedup_lines", "dsir_select", "bigram_logppl",
      "dedup_cluster_resolve")

    val queryTimes = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        name -> time(force(fn(spark, sfDir)))
      }
    }

    // BASELINE.md metrics -------------------------------------------------
    // Snapshot copy path (S1→P1/P2/casts→K1): full lineitem through
    // projection+cast, forced.
    val lineitem = Tables.read(spark, sfDir, "lineitem")
    val nLineitem = lineitem.count()
    val snapSec = time {
      force(CoreOps.alignToTarget(lineitem,
        lineitem.schema.fields.map(f => graft.types.CHColumn(f.name,
          graft.types.CHType.fromSparkType(f.dataType, f.nullable))).toSeq))
    }

    // CDC apply path (S2→A1→K1/K2): events → changelog → final state.
    // Amplified 10x (seq/user offsets keep keys disjoint per replica) so
    // the rate reflects steady-state work, not fixed job overhead.
    val eventsBase = Tables.events(spark, sfDir)
    val baseSpan = eventsBase.agg(max(col("event_id"))).head.getLong(0) + 1
    val events = spark.range(0, 10).toDF("__rep")
      .crossJoin(eventsBase)
      .select(
        (col("event_id") + col("__rep") * baseSpan).as("event_id"),
        col("ts"),
        (col("user_id") + col("__rep") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .cache()
    val nEvents = events.count()
    val cdcSec = time {
      force(CdcApply.finalStateDeclarative(
        Changelog.fromEvents(events),
        Seq("user_id"), Seq("last_ts", "total_value", "n_events"),
        batchSize = 65536L))
    }
    events.unpersist()

    // Text/dedup throughput at real volume: amplify the documents table to
    // ~20k docs with id offsets (each copy is an exact dup of its base, so
    // the dedup ops do real duplicate-cluster work) and measure rows/s
    // through the heaviest pipeline ops.
    val docsBase = Tables.read(spark, sfDir, "documents")
    val baseCount = docsBase.count()
    val reps = math.max(1L, 20000L / math.max(baseCount, 1L))
    val amplified = spark.range(0, reps).toDF("__rep")
      .crossJoin(docsBase)
      .select((col("doc_id") + col("__rep") * 1000000L).as("doc_id"), col("text"))
      .cache()
    val nDocs = amplified.count()
    val textSec = time {
      force(amplified.select(col("doc_id"),
        graft.text.TextOps.tokenCount(col("text")).as("nt"),
        graft.text.TextOps.qualityScore(col("text")).as("q"),
        graft.functions.GraftFunctions.fingerprint64(col("text")).as("fp")))
    }
    val minhashSec = time {
      force(graft.dedup.Dedup.minhashCandidatePairs(
        amplified, "doc_id", "text", jaccardThreshold = 0.9))
    }
    amplified.unpersist()

    // Dedup (A1) overhead vs plain append at the same volume — both sides
    // do a real parquet append so the ratio reflects pipeline cost, not
    // scan noise (BASELINE.md: "≤ 2× plain append").
    val benchTmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val plainSec = time(
      events.write.mode("overwrite").parquet(s"$benchTmp/plain"))
    val dedupSec = time(
      CoreOps.dedupLastWinsAgg(events, Seq("user_id"), "event_id")
        .write.mode("overwrite").parquet(s"$benchTmp/dedup"))

    val all = queryTimes ++ Seq(
      "snapshot_copy" -> snapSec, "cdc_apply" -> cdcSec, "dedup_a1" -> dedupSec,
      "text_pipeline_20k" -> textSec, "minhash_20k" -> minhashSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${all.map(_._2).sum}%.3f"
    val extra =
      f""""snapshot_rows_per_s":${nLineitem / math.max(snapSec, 1e-9)}%.0f,""" +
        f""""cdc_events_per_s":${nEvents / math.max(cdcSec, 1e-9)}%.0f,""" +
        f""""dedup_overhead_x":${dedupSec / math.max(plainSec, 1e-9)}%.2f,""" +
        f""""text_docs_per_s":${nDocs / math.max(textSec, 1e-9)}%.0f,""" +
        f""""minhash_docs_per_s":${nDocs / math.max(minhashSec, 1e-9)}%.0f"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$extra,"sf":"$sfDir"}""")
    spark.stop()
  }
}

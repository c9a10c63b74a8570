package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Scale-shape pins: the physical-plan properties the engine relies on at
  * 100 TB — salted dedup equivalence, bucketed co-located joins, scalar
  * pipelines staying shuffle-free, scan pruning/pushdown.
  */
class ScaleSpec extends AnyFunSuite with SparkTestBase {

  test("salted two-phase dedup ≡ plain agg dedup (incl. a hot key)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 90% of events hit key 1 (hot), rest spread over 100 keys
    val rows = (1L to 5000L).map { seq =>
      val k = if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(100).toLong + 2
      (k, seq, s"v$seq")
    }
    val df = rows.toDF("id", "seq", "v")
    val plain = CoreOps.dedupLastWinsAgg(df, Seq("id"), "seq")
      .orderBy("id").collect().toSeq
    val salted = CoreOps.dedupLastWinsSalted(df, Seq("id"), "seq", saltBuckets = 16)
      .orderBy("id").collect().toSeq
    assert(salted == plain)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // warehouse dir is a static conf, set in SparkTestBase
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val sf = "/root/testdata/sf0.001"
    graft.sources.Tables.read(spark, sf, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.sources.Tables.read(spark, sf, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable auto-broadcast so the join would otherwise shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("fused CDC user-state plan has exactly one shuffle exchange") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = graft.cdc.Changelog.userStateFused(events, 64L)
      .queryExecution.executedPlan.toString
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 shuffle:\n$plan")
    assert(!plan.contains("BroadcastExchange"), s"no joins expected:\n$plan")
  }

  test("minhash banding: candidate volume stays near the amplification floor") {
    // The round-6 premix regression, pinned: affine lanes straight over
    // the LINEAR rolling fingerprint skew per-lane argmins onto popular
    // shingles and band buckets explode quadratically (6.6x the banded
    // pairs at sf0.1 → a 53 s bench). With the quadratic premix the
    // volume must stay near the structural floor: 4 exact copies of each
    // of the 500 sf0.001 docs share all 16 bands (500·16·C(4,2) = 48k
    // pairs), measured 72.6k with corpus near-dup structure on top.
    import org.apache.spark.sql.functions.{aggregate => aggr}
    val base = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val amplified = spark.range(0, 4).toDF("__rep").crossJoin(base)
      .select((col("doc_id") + col("__rep") * 1000000L).as("doc_id"), col("text"))
    val sig = graft.dedup.Dedup.withMinhashSignature(amplified, "text", 5, 64)
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => aggr(slice(col("__sig"), b * 4 + 1, lit(4)), lit(0L),
          (h, v) => (h * 31 + v) % lit(1000000007L)))))
      .withColumnRenamed("col", "band_key")
    val stats = banded.groupBy(col("pos"), col("band_key")).count()
      .agg(max("count").as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("banded_pairs")).collect()(0)
    val maxBucket = stats.getLong(0)
    val bandedPairs = stats.getDouble(1)
    assert(maxBucket <= 100, s"band bucket blowup: max bucket $maxBucket")
    assert(bandedPairs <= 150000.0,
      s"banded pair volume $bandedPairs — min-wise bias regression?")
  }

  test("dimension joins broadcast: fact table never shuffles for the dims") {
    val sf = "/root/testdata/sf0.001"
    val cust = graft.sources.Tables.read(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val li = graft.sources.Tables.read(spark, sf, "lineitem")
    val orders = graft.sources.Tables.read(spark, sf, "orders")
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // the only allowed non-broadcast exchange is the final aggregation's
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
    assert(shuffles <= 1, s"fact table re-shuffled:\n$plan")
  }

  test("snapshot cast/mask pipeline is a single scan stage: pruned, no shuffle") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.sources.Tables.read(spark, sf, "lineitem")
    val projected = CoreOps.alignToTarget(
      li.filter(col("l_orderkey") > 100),
      graft.sources.Introspect.table(spark, sf, "lineitem").map(_._2)
        .filter(c => Set("l_orderkey", "l_linenumber", "l_quantity").contains(c.name)))
    val plan = projected.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_orderkey,100)"),
      s"filter not pushed:\n$plan")
    // column pruning: only the three projected columns are read
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"scan not pruned:\n$plan")
  }

  test("q6 selective agg: every predicate pushed to the parquet scan, pruned read") {
    val q = graft.SparkEntry.queries("q6_selective")(spark, "/root/testdata/sf0.001")
    // read the scan node's untruncated metadata (plan toString elides
    // lists; sparkPlan avoids the opaque AQE wrapper)
    val scan = q.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no parquet scan in plan"))
    val pushed = scan.metadata("PushedFilters")
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount,0.03)", "LessThanOrEqual(l_discount,0.07)",
      "LessThan(l_quantity,24.0)").foreach { f =>
      assert(pushed.contains(f), s"$f not pushed: $pushed")
    }
    // only the four referenced columns are read
    assert(scan.schema.fieldNames.toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"scan not pruned: ${scan.schema.fieldNames.mkString(",")}")
  }

  test("q18 shape: lineitem aggregates BEFORE the join; customer broadcasts") {
    val q = graft.SparkEntry.queries("q18_large_orders")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"customer not broadcast:\n$plan")
    // the HAVING filter applies to the aggregate output, not post-join
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0, s"missing agg/join:\n$plan")
  }

  test("q4 semi-join keeps LeftSemi in the physical plan") {
    val q = graft.SparkEntry.queries("q4_priority")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
  }

  test("q14: month window pushed to the fact scan; part broadcasts") {
    val q = graft.SparkEntry.queries("q14_promo")(spark, "/root/testdata/sf0.001")
    val scans = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val li = scans.find(_.schema.fieldNames.contains("l_shipdate"))
      .getOrElse(fail("no lineitem scan"))
    val pushed = li.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate"), s"date window not pushed: $pushed")
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("q10: selective filters pushed; agg shrinks rows before dims broadcast") {
    val q = graft.SparkEntry.queries("q10_returns")(spark, "/root/testdata/sf0.001")
    val scans = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val li = scans.find(_.schema.fieldNames.contains("l_returnflag"))
      .getOrElse(fail("no lineitem scan"))
    assert(li.metadata("PushedFilters").contains("EqualTo(l_returnflag,R)"),
      s"returnflag not pushed: ${li.metadata("PushedFilters")}")
    val ord = scans.find(_.schema.fieldNames.contains("o_orderdate"))
      .getOrElse(fail("no orders scan"))
    assert(ord.metadata("PushedFilters").contains("GreaterThanOrEqual(o_orderdate"),
      s"date not pushed: ${ord.metadata("PushedFilters")}")
    val plan = q.queryExecution.executedPlan.toString
    // customer/nation joins are broadcast; the only exchanges are the agg
    // shuffle on the customer key and ordering for the top-k
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
  }

  test("quantized ANN corpus scans tinyint codes, not float vectors") {
    val q = graft.SparkEntry.queries("embed_topk_q8")(spark, "/root/testdata/sf0.001")
    // scoring reads only the code arrays: the cosine expression must
    // reference no float-typed embedding column post-quantization
    val plan = q.queryExecution.analyzed.toString
    assert(plan.contains("qcodes"), s"no quantized codes in plan:\n$plan")
    assert(q.count() > 0)
  }

  test("chunking is a pure scan: zero exchanges in the plan") {
    val q = graft.SparkEntry.queries("chunk_docs")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("the declared pure-scan queries stay exchange-free (100 TB scoring shape)") {
    // each of these is a per-document scalar pipeline whose whole point
    // is running at corpus scale as nothing but the scan — a shuffle
    // sneaking into any of them is a silent 100 TB regression even when
    // results stay correct (mixture_temperature's bounded counts
    // aggregate runs at plan-CONSTRUCTION; the declared plan is the
    // gate-applied scan)
    val pureScans = Seq("quality_model_fixed", "mixture_temperature",
      "mp4_meta", "text_metrics", "lang_id", "doc_fingerprint",
      "pii_scrub", "normalize_text", "rep_ratios", "url_normalize",
      "media_dims", "wav_meta", "simhash_docs", "sample_deterministic")
    for (name <- pureScans) {
      val q = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name grew a shuffle:\n$plan")
    }
  }

  test("PQ ANN: one shuffle (the top-k window); query side broadcasts") {
    val q = graft.SparkEntry.queries("embed_topk_pq")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$plan")
    assert(plan.contains("pq_encode"), s"corpus not PQ-encoded in-plan:\n$plan")
  }

  test("bloom-prefiltered dedup probes inside the scan (expression, not join)") {
    val q = graft.SparkEntry.queries("dedup_incremental_bloom")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"no in-scan probe:\n$plan")
    assert(q.count() > 0)
  }

  test("gopher filter bundle stays a single scan + single-row aggregate") {
    val q = graft.SparkEntry.queries("gopher_filters")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    // one exchange for the global aggregate, nothing else
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected at most the final-agg exchange:\n$plan")
  }

  test("DSIR scoring: ratio table broadcasts, one doc-id shuffle, repartition-stable") {
    val sf = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.read(spark, sf, "documents")
    val raw = d.filter(col("doc_id") % 10 =!= 0)
    val tgt = d.filter(col("doc_id") % 10 === 0)
    val ratios = graft.text.Dsir.logRatios(raw, tgt, "text", buckets = 256)
    val weights = graft.text.Dsir.importanceWeights(raw, "doc_id", "text", ratios, buckets = 256)
    val plan = weights.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"ratio table should broadcast:\n$plan")
    // exact decimal weights must be invariant under input partitioning —
    // the engine-exactness contract the oracle gate relies on
    val a = weights.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = graft.text.Dsir.importanceWeights(
      raw.repartition(13), "doc_id", "text", ratios, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("clusterPairs: convergence rides the propagation job — no left_anti probe queries") {
    import spark.implicits._
    // chain 0-1-2-…-6 (diameter 6): the min label must propagate the full
    // depth, so several rounds run — each must be ONE aggregation job
    // with the changed-count observed, not a separate left_anti + isEmpty
    // probe (the r5 shape this pins against).
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val antiSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit = {
        seen.incrementAndGet()
        if (qe.executedPlan.toString.contains("LeftAnti")) antiSeen.set(true)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      // driverMaxEdges = 0 forces the iterative loop — the shape this
      // test pins (the r17 driver fast path runs no propagation rounds)
      val pairs = (0L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val labels = graft.dedup.Dedup.clusterPairs(pairs, driverMaxEdges = 0L)
        .collect()
      assert(labels.length == 7 && labels.forall(_.getLong(1) == 0L))
      // the listener bus is async: wait for the event count to go stable
      var last = -1
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 50) {
        val c = seen.get
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(100); spins += 1
      }
      assert(!antiSeen.get, "a left_anti convergence probe query executed")
    } finally spark.listenerManager.unregister(ql)
  }

  test("clusterPairs: a 300-hop chain converges within the default round valve") {
    import spark.implicits._
    // regression pin for the pointer-doubling depth math: 8 one-hop
    // rounds reach depth 8, then doubling roughly doubles per round
    // (17, 35, 71, 143, 287, 575...) — a 300-hop chain must converge
    // comfortably inside the 16-round default instead of throwing or
    // (the pre-r7 failure mode) silently splitting
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = graft.dedup.Dedup.clusterPairs(pairs, driverMaxEdges = 0L)
      .collect()
    assert(labels.length == 301 && labels.forall(_.getLong(1) == 0L))
  }

  test("clusterPairs: driver fast path = iterative loop, label for label") {
    import spark.implicits._
    // r17 optimization parity pin: chains, a cycle, a star, duplicate and
    // reversed edges — the collected union-find must produce the exact
    // (id, min-id) map the propagation loop does
    val pairs = (Seq((5L, 9L), (9L, 5L), (9L, 13L), (40L, 41L), (41L, 42L),
      (42L, 40L), (100L, 7L), (100L, 3L), (100L, 55L)) ++
      (200L until 260L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val fast = graft.dedup.Dedup.clusterPairs(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = graft.dedup.Dedup.clusterPairs(pairs, driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == slow)
    assert(fast.contains((13L, 5L)) && fast.contains((55L, 3L)))
  }

  test("clusterPairs: convergence exactly on the valve round verifies, not throws") {
    import spark.implicits._
    // a single edge needs exactly one propagation round; with maxIters=1
    // that round IS the valve round and still reports a changed label.
    // r7 ADVICE: the old code threw here because no confirming
    // zero-change round ever ran — the fix runs one verification round.
    // (driverMaxEdges = 0: the valve under test belongs to the
    // iterative loop — the driver fast path always converges)
    val pair = Seq((0L, 1L)).toDF("id_a", "id_b")
    val labels = graft.dedup.Dedup.clusterPairs(pair, maxIters = 1,
      driverMaxEdges = 0L).collect()
    assert(labels.length == 2 && labels.forall(_.getLong(1) == 0L))
    // and a genuinely unconverged component under the same tiny valve
    // must still throw rather than return split clusters
    val deep = (0L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      graft.dedup.Dedup.clusterPairs(deep, maxIters = 1, driverMaxEdges = 0L)
        .collect()
    }
  }

  test("banded catalog: a micro-batch's scan prunes partitions and pushes band keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-banded-prune")
      .toString + "/catalog"
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(200)
    graft.dedup.BandedCatalog.append(
      graft.dedup.Dedup.minhashNearCatalog(docs, "doc_id", "text"), dir)
    val totalFiles = graft.dedup.BandedCatalog.fileCount(spark, dir)

    // a 2-doc micro-batch touches ≤ 32 of the 64 buckets; the catalog
    // read must carry a bucket partition filter (census-visible) and a
    // band_key pushdown, and actually open fewer files than the catalog
    val batch = Seq((900001L, "one tiny probe document"),
      (900002L, "another tiny probe document")).toDF("doc_id", "text")
    val probe = graft.dedup.BandedCatalog.bandRows(
      graft.dedup.Dedup.minhashNearCatalog(batch, "doc_id", "text"),
      bands = 16, rowsPerBand = 4,
      numBuckets = graft.dedup.BandedCatalog.DefaultBuckets, added = 0L)
    val pruned = graft.dedup.BandedCatalog.readForBatch(spark, dir, probe)
    val plan = pruned.queryExecution.executedPlan.toString
    // r17: bucket pruning moved from a PartitionFilters entry to the
    // FILE INDEX itself (readBucketDirs lists only probed buckets — the
    // listing is O(batch), not O(catalog)); the witness is the relation
    // covering strictly fewer paths than the catalog has buckets
    val nPaths = """InMemoryFileIndex\((\d+) paths\)""".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(nPaths.exists(_ < graft.dedup.BandedCatalog.DefaultBuckets),
      s"catalog relation must cover only the probed buckets' dirs:\n$plan")
    assert(plan.contains("In(band_key"),
      s"batch band keys must push into the parquet scan:\n$plan")
    pruned.collect()
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    val numFiles = scans.head.metrics("numFiles").value
    assert(numFiles < totalFiles,
      s"pruned scan opened $numFiles of $totalFiles files — no pruning happened")
  }

  test("keep-best winners: argmax is one combiner-backed agg — no window over the corpus") {
    import spark.implicits._
    // 100 two-doc clusters, singletons, and one 100-doc giant cluster:
    // the shape that melts a Window.partitionBy(cluster) at 100 TB (a
    // giant duplicate group serializes onto one task with the full rows).
    // The winners plan must stay max(struct(score, -id)) — partial agg
    // map-side, no Window operator, bounded shuffles.
    val docs = (1L to 500L).map(i => (i, (i % 97).toDouble)).toDF("id", "q")
    val pairs = ((1L until 200L by 2).map(i => (i, i + 1)) ++
      (401L until 500L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val winners = graft.dedup.Dedup.clusterWinners(docs, "id", pairs, col("q"))
    val rows = winners.collect()
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
    // count operators in the executed (final) section only
    val plan = winners.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"),
      s"winners argmax must not window the corpus:\n$plan")
    assert(plan.contains("partial_max"),
      s"argmax must combine map-side (partial_max):\n$plan")
    // 3 = docs-side join input, clusters-side join input (AQE turns it
    // into a broadcast at runtime), and the cluster_id aggregation
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 3, s"winners plan grew extra shuffles ($shuffles):\n$plan")
    // the giant cluster yields exactly ONE winner: the max-score member
    // (score = id mod 97 peaks at id 484 in 401..500)
    val giant = rows.filter(r => r.getLong(1) >= 401L && r.getLong(1) <= 500L)
    assert(giant.length == 1 && giant.head.getLong(1) == 484L &&
      giant.head.getDouble(2) == 96.0)
  }

  test("ivfTrainAuto: no pre-count — the corpus is scanned at most once (bounded read)") {
    // the r4/r5 fix class (Pq.train, now ivfTrainAuto): deriving a sample
    // fraction from corpus.count() is one gratuitous full pass at 100 TB.
    // Pin it with a row accumulator: the old shape (count + collect) reads
    // every row twice; the bounded limit-collect reads each row AT MOST once.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val acc = spark.sparkContext.longAccumulator("ivfCorpusRows")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(emb.schema)
    val counted = emb.mapPartitions { it => it.map { r => acc.add(1); r } }(enc)
    val cents = graft.sim.Similarity.ivfTrainAuto(counted, "embedding", nLists = 8)
    assert(cents.length == 8)
    assert(acc.value <= n,
      s"corpus scanned more than once: ${acc.value} rows touched, corpus has $n")
    // the rowCount fast path keeps the uniform seeded sample — and still
    // never triggers a count
    val acc2 = spark.sparkContext.longAccumulator("ivfCorpusRows2")
    val counted2 = emb.mapPartitions { it => it.map { r => acc2.add(1); r } }(enc)
    val cents2 = graft.sim.Similarity.ivfTrainAuto(
      counted2, "embedding", nLists = 8, targetRows = n / 2, rowCount = Some(n))
    assert(cents2.length == 8)
    assert(acc2.value <= n)
  }

  test("catalog growth leaves the per-trigger read constant: files opened = probed buckets only") {
    import spark.implicits._
    import graft.dedup.ExactCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft-scale-cat").toString
    val nb = 8
    def entries(fps: Seq[Long]) = fps.map(fp => (fp, fp * 31 + 7)).toDF("fp", "h2")
    // seed across all buckets (bucket = fp mod 8)
    ExactCatalog.append(entries(1L to 200L), dir, numBuckets = nb, added = 0L)
    // the trigger's probe: fingerprints that all land in bucket 3
    val probe = entries((0 until 50).map(i => 3L + 8L * i))

    def filesScanned(): Long = {
      val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = ExactCatalog.readForBatch(spark, dir, probe)
        df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.map(_.selectedPartitions.totalNumberOfFiles).sum
      } finally prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
    def bucket3Files(): Int =
      Option(new java.io.File(dir, "bucket=3").listFiles)
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)

    val before = filesScanned()
    assert(before >= 1 && before == bucket3Files(),
      s"trigger read $before files, bucket 3 holds ${bucket3Files()}")
    val totalBefore = ExactCatalog.fileCount(spark, dir)

    // grow the catalog 4x with appends landing ONLY in other buckets —
    // the probe's trigger cost must not notice
    (0 until 4).foreach { k =>
      val b = Seq(0L, 1L, 2L, 4L)(k)
      ExactCatalog.append(
        entries((1L to 200L).map(i => i * 8L + b)), dir,
        numBuckets = nb, added = (k + 1).toLong)
    }
    assert(ExactCatalog.fileCount(spark, dir) >= totalBefore + 4)
    val after = filesScanned()
    assert(after == before,
      s"per-trigger read grew with the catalog: $before -> $after files")

    // growth INTO the probed bucket is what grows the read (and only
    // by that bucket's own occupancy) — the O(bucket occupancy) claim
    ExactCatalog.append(
      entries((1L to 50L).map(i => i * 8L + 3L)), dir,
      numBuckets = nb, added = 9L)
    assert(filesScanned() == bucket3Files().toLong)
  }

  test("image-phash catalog: quarter-key probe prunes buckets; growth elsewhere leaves the read flat") {
    import spark.implicits._
    import graft.dedup.{ImageCatalog, ImageDedup}
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-scale-imgcat").toString
    val nb = 8
    def phashEntries(hashes: Seq[Long]) =
      ImageCatalog.phashEntriesOf(hashes.zipWithIndex
        .map { case (h, i) => (i.toLong, h) }.toDF("id", "phash"))
    ImageCatalog.appendPhash(phashEntries((1L to 200L).map(_ * 0x9e3779b97f4aL)),
      dir, numBuckets = nb, added = 0L)
    // the probe: one image hash → 4 quarter keys → ≤4 buckets
    val probeHash = 42L * 0x9e3779b97f4aL
    val probe = phashEntries(Seq(probeHash)).select(col("fp"))
    val _ = ImageDedup.MaxBlockedHamming // blocking contract under test
    def filesScanned(): Long = {
      val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        graft.dedup.ExactCatalog.readForBatch(spark, dir, probe,
          kind = ImageCatalog.KindPhash)
          .queryExecution.executedPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec => f
          }.map(_.selectedPartitions.totalNumberOfFiles).sum
      } finally prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
    val before = filesScanned()
    assert(before >= 1 && before <= nb.toLong,
      s"probe must read a strict bucket subset, got $before")
    // grow the catalog 4x — the probe's read must not notice (new
    // entries use hash masses disjoint from the probe's quarter keys
    // only by bucket residue chance, so assert <=, the pruning bound)
    (1 to 4).foreach { k =>
      ImageCatalog.appendPhash(
        phashEntries((1L to 200L).map(i => (i + 1000L * k) * 0x517cc1b727220a95L)),
        dir, numBuckets = nb, added = k.toLong)
    }
    val after = filesScanned()
    // the probe touches the SAME ≤4 quarter-key buckets; growth added
    // at most one file per touched bucket per append
    assert(after <= before + 4 * 4,
      s"per-trigger read outgrew the probed buckets: $before -> $after")
    // and the audio kind refuses this dir (universe guard at scale too)
    val e = intercept[IllegalArgumentException] {
      graft.dedup.ExactCatalog.readForBatch(spark, dir, probe,
        kind = graft.dedup.AudioDedup.KindEnvelope)
    }
    assert(e.getMessage.contains("image_phash_q16"))
  }

  test("BPE training leaves no cached vocab tables behind") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // threshold 0 forces the distributed loop (the path that caches)
    val merges = graft.text.Bpe.train(
      Seq("low low lower lowest", "newest newest new").toDF("text"),
      "text", numMerges = 4, localVocabThreshold = 0L)
    assert(merges.nonEmpty)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"leaked cached RDDs: $after")
  }
}

package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DedupSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docsWithDups = {
    import spark.implicits._
    val base = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    // plant controlled duplicates: exact copies (id+10000) and near copies
    // (id+20000, one word appended) of the first 20 docs
    val firstTexts = base.filter($"doc_id" < 20)
    val exact = firstTexts.select(($"doc_id" + 10000).as("doc_id"), $"text")
    val near = firstTexts.select(($"doc_id" + 20000).as("doc_id"),
      concat($"text", lit(" appended")).as("text"))
    base.unionByName(exact).unionByName(near).cache()
  }

  test("exact dedup: planted copies collapse to min id") {
    val deduped = Dedup.dedupExact(docsWithDups, "doc_id", "text")
    assert(deduped.count() == docsWithDups.count() - 20)
    // canonical row for a planted dup is the original (min id)
    val kept = deduped.filter(col("doc_id") === 10005).count()
    assert(kept == 0) // 10005 is the copy; 5 survives
    assert(deduped.filter(col("doc_id") === 5).count() == 1)

    val groups = Dedup.exactDupGroups(docsWithDups, "doc_id", "text")
    assert(groups.filter(col("n_dups") === 2).count() == 20)
  }

  test("minhash LSH finds planted near-duplicates with no quadratic blowup") {
    val pairs = Dedup.minhashCandidatePairs(
      docsWithDups, "doc_id", "text",
      shingleSize = 5, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.5)
      .collect()
    // exact copies must be found (est jaccard 1.0); note (10000+x, 20000+x)
    // pairs also differ by 10000, so anchor on id_a < 20
    val exactPairs = pairs.filter(p =>
      p.getLong(0) < 20 && p.getLong(1) == p.getLong(0) + 10000)
    assert(exactPairs.length == 20, s"found ${exactPairs.length} of 20 exact pairs")
    exactPairs.foreach(p => assert(p.getDouble(2) == 1.0))
    // near copies (one appended word) should mostly surface
    val nearPairs = pairs.count(p =>
      p.getLong(0) < 20 && p.getLong(1) == p.getLong(0) + 20000)
    assert(nearPairs >= 15, s"found $nearPairs of 20 near pairs")
  }

  test("exact jaccard verification of candidate pairs") {
    import spark.implicits._
    val pairs = Seq((0L, 10000L), (0L, 20000L)).toDF("id_a", "id_b")
    val verified = Dedup.verifyPairsJaccard(pairs, docsWithDups, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(verified((0L, 10000L)) == 1.0)
    assert(verified((0L, 20000L)) > 0.8 && verified((0L, 20000L)) < 1.0)
  }

  test("simhash blocking finds exact and near copies") {
    val pairs = Dedup.simhashCandidatePairs(docsWithDups, "doc_id", "text", maxHamming = 6)
      .collect()
    val exactPairs = pairs.filter(p =>
      p.getLong(0) < 20 && p.getLong(1) == p.getLong(0) + 10000)
    assert(exactPairs.length == 20)
    exactPairs.foreach(p => assert(p.getAs[Int]("hamming") == 0))
  }

  test("cluster pairs: chains collapse to min id; full near-dedup keeps one per cluster") {
    import spark.implicits._
    // components: {1,2,3,4} via chain, {10,11}, isolated pair-free 99
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.clusterPairs(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))

    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    val kept = Dedup.dedupNearByClusters(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))

    // end-to-end: minhash candidates over planted dups collapse correctly
    val mh = Dedup.minhashCandidatePairs(docsWithDups, "doc_id", "text",
      jaccardThreshold = 0.9)
    val dedupedNear = Dedup.dedupNearByClusters(
      docsWithDups.select("doc_id"), "doc_id", mh)
      .collect().map(_.getLong(0)).toSet
    // a planted exact copy always clusters with its (smaller) base id, so
    // no copy can ever be a cluster canonical; the base itself may merge
    // into an even smaller organic near-dup cluster, which is correct.
    (0L until 20L).foreach { id =>
      assert(!dedupedNear.contains(id + 10000))
    }
    assert(dedupedNear.size < docsWithDups.count())
    assert(dedupedNear.nonEmpty)
  }

  test("exactRecallBanding: minimal band count over the mismatch budget; survivors identical") {
    // k=64 t=0.9: est>=0.9 means <=6 mismatching lanes; 8 disjoint bands
    // can't all be touched by 6 mismatches -> smallest divisor above 6... is 8
    assert(Dedup.exactRecallBanding(64, 0.9).contains((8, 8)))
    // t=0.8: budget 12 -> 16 bands (the neardedup_incremental config is
    // already exact-recall); t=0.5: budget 32 -> single-lane bands
    assert(Dedup.exactRecallBanding(64, 0.8).contains((16, 4)))
    assert(Dedup.exactRecallBanding(64, 0.5).contains((64, 1)))
    assert(Dedup.exactRecallBanding(64, 1.0).contains((1, 64)))
    // the guarantee on real data: matched banding produces the IDENTICAL
    // survivor set to the default at threshold 0.9 (the bench relies on it)
    def pairs(b: Int, r: Int) = Dedup.minhashCandidatePairs(
      docsWithDups, "doc_id", "text", bands = b, rowsPerBand = r,
      jaccardThreshold = 0.9)
      .collect().map(p => (p.getLong(0), p.getLong(1))).toSet
    assert(pairs(8, 8) == pairs(16, 4))
  }

  test("clusterWinners: keep-best policy — max score wins, ties to min id, singletons survive") {
    import spark.implicits._
    // components: {1,2,3} chain, {10,11}; 99 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L),   // 2 and 3 tie at 9 -> 2 wins (min id)
      (10L, 4L), (11L, 7L),           // 11 wins on score despite larger id
      (99L, 1L)                       // singleton: wins its own cluster
    ).toDF("doc_id", "s")
    val winners = Dedup.clusterWinners(docs, "doc_id", pairs, col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(winners == Set((1L, 2L, 9L), (10L, 11L, 7L), (99L, 99L, 1L)))

    val kept = Dedup.dedupNearKeepBest(docs, "doc_id", pairs, col("s"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 11L, 99L))
  }

  test("embedding near-dup via hyperplane buckets") {
    import spark.implicits._
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    // plant exact-duplicate vectors
    val dups = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val all = emb.unionByName(dups)
    val pairs = Dedup.embeddingNearDupPairs(all, "vec_id", "embedding",
      threshold = 0.999, planes = 8)
      .collect()
    val planted = pairs.count(p => p.getLong(1) == p.getLong(0) + 10000)
    assert(planted == 10, s"found $planted of 10 planted vector dups")
  }

  test("incremental dedup: in-batch collapse + catalog anti-join, collision-safe") {
    import spark.implicits._
    val corpus = Seq((1L, "known doc"), (2L, "another known")).toDF("doc_id", "text")
    val catalog = Dedup.dedupCatalog(corpus, "text")
    assert(catalog.columns.toSeq == Seq("fp", "h2"))

    val crawl = Seq(
      (10L, "known doc"),     // in catalog → dropped
      (11L, "fresh content"), // survives
      (12L, "fresh content"), // in-batch dup → dropped
      (13L, "another known"), // in catalog → dropped
      (14L, "brand new")      // survives
    ).toDF("doc_id", "text")
    val got = Dedup.dedupIncremental(crawl, catalog, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 14L))

    // collision discipline: same fp, different text must NOT be dropped
    // (the h2 re-check catches what the 1e9+7 rolling hash cannot)
    val fp = graft.functions.GraftHash.fingerprint64(
      org.apache.spark.unsafe.types.UTF8String.fromString("known doc"))
    val fakeCatalog = Seq((fp, "a DIFFERENT text with the same fp")).toDF("fp", "h2")
    val collides = Dedup.dedupIncremental(
      Seq((20L, "known doc")).toDF("doc_id", "text"), fakeCatalog, "doc_id", "text")
    assert(collides.count() == 1) // kept: fp matched, h2 did not
  }

  test("incremental near-dedup: catalog matches drop, in-batch clusters collapse") {
    import spark.implicits._
    val base = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val corpus = base.filter($"doc_id" < 250)
    val catalog = Dedup.minhashNearCatalog(corpus, "doc_id", "text")
    assert(catalog.columns.toSeq == Seq("id", "__sig"))

    // new crawl: near-copies of catalog docs (one word appended), fresh
    // docs (ids >= 250 are distinct texts), and an in-batch near-dup pair
    val nearOld = corpus.filter($"doc_id" < 10)
      .select(($"doc_id" + 50000).as("doc_id"), concat($"text", lit(" appended")).as("text"))
    val freshBase = base.filter($"doc_id" >= 250 && $"doc_id" < 300)
    val inBatchDup = freshBase.filter($"doc_id" === 260)
      .select(($"doc_id" + 60000).as("doc_id"), concat($"text", lit(" tail")).as("text"))
    val crawl = nearOld.unionByName(freshBase).unionByName(inBatchDup)

    val survivors = Dedup.dedupNearIncremental(
        crawl, catalog, "doc_id", "text", jaccardThreshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // every near-copy of a catalog doc dropped; the planted in-batch dup
    // lost to its (smaller-id) original
    assert(survivors.intersect((50000L until 50010L).toSet).isEmpty)
    assert(!survivors.contains(60260L))

    // exact-equality oracle, replicated locally from the signatures: a
    // crawl doc drops iff it SHARES A BAND and estimates >= threshold
    // against a catalog doc; remaining docs cluster the same way in-batch
    // and keep the min id per component (all deterministic)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashNearCatalog(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val cSig = sigs(corpus); val nSig = sigs(crawl)
    def bandsOf(s: Array[Long]) =
      s.grouped(4).take(16).map(_.toSeq).zipWithIndex.map(_.swap).toSet
    def est(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / 64.0
    def near(a: Array[Long], b: Array[Long]) =
      bandsOf(a).intersect(bandsOf(b)).nonEmpty && est(a, b) >= 0.8
    val hit = nSig.keySet.filter(n => cSig.values.exists(near(nSig(n), _)))
    val fresh = nSig.keySet -- hit
    // union-find over in-batch near pairs
    val parent = scala.collection.mutable.Map(fresh.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- fresh; b <- fresh if a < b && near(nSig(a), nSig(b)))
      { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = fresh.filter(i => find(i) == i)
    assert(survivors == expected,
      s"extra=${(survivors -- expected).take(5)} missing=${(expected -- survivors).take(5)}")
  }

  test("verifyJaccardExact: exact set overlap refines LSH candidates, integer threshold") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),  // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"),  // near dup of 0
      (3L, "utterly unrelated content with no shared shingles whatsoever!")
    ).toDF("doc_id", "text")
    // all (a < b) pairs as candidates: the verifier must keep only real overlap
    val pairs = docs.select($"doc_id".as("id_a")).crossJoin(docs.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val out = Dedup.verifyJaccardExact(docs, "doc_id", "text", pairs,
      shingleSize = 5, thresholdNum = 7, thresholdDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // exact dup: intersection == union (Jaccard 1)
    val d01 = out.find(t => t._1 == 0L && t._2 == 1L).get
    assert(d01._3 == d01._4)
    // near dup survives 0.7; unrelated doc 3 pairs with nothing
    assert(out.exists(t => t._1 == 0L && t._2 == 2L))
    assert(out.forall(t => t._2 != 3L && t._1 != 3L))
    // integer cross-multiplication: every kept pair satisfies inter*10 >= union*7,
    // and the near-dup pair is strictly below Jaccard 1
    assert(out.forall(t => t._3 * 10 >= t._4 * 7))
    val d02 = out.find(t => t._1 == 0L && t._2 == 2L).get
    assert(d02._3 < d02._4)
  }

  test("verifyJaccardExact agrees with the signature estimate on planted corpus") {
    // over the sf0.001 corpus with planted dups: every exact-verified pair
    // at >= 0.7 must come out of the candidate set, and exact dups verify
    // at Jaccard exactly 1
    val cand = Dedup.minhashCandidatePairs(docsWithDups, "doc_id", "text",
      shingleSize = 5, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val verified = Dedup.verifyJaccardExact(docsWithDups, "doc_id", "text", cand,
      shingleSize = 5, thresholdNum = 7, thresholdDen = 10)
    assert(verified.count() > 0, "planted dups must verify")
    // the exact-copy pairs (amplified ids) verify at inter == union
    val exact = verified.filter(col("inter_size") === col("union_size")).count()
    assert(exact > 0, "exact copies must score Jaccard 1")
  }

  test("dedupSpans: every span keeps its first corpus occurrence, in order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d"),     // spans [a b][c d] — both first occurrences
      (2L, "a b x y"),     // [a b] dups doc1 → survives as "x y"
      (3L, "c d x y z"),   // [c d],[x y] dup → survives as lone "z"
      (4L, "a b"),         // every span seen before → doc vanishes
      (5L, "b c a b")      // [b c] fresh, [a b] dup → "b c"
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(corpus, "doc_id", "text", spanTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a b c d", 2L -> "x y", 3L -> "z", 5L -> "b c"))

    // corpus-wide invariant on real data: surviving spans are globally
    // unique — re-deriving (span → occurrences) from the output finds no
    // span kept twice, and the kept span multiset equals the distinct
    // input span set
    val docs = docsWithDups
    val deduped = Dedup.dedupSpans(docs, "doc_id", "text", spanTokens = 2)
    def spans(df: org.apache.spark.sql.DataFrame) = {
      val toks = graft.text.TextOps.tokens(col("text"))
      val n = ceil(size(toks).cast("double") / 2).cast("int")
      df.select(col("doc_id"), explode(transform(
        sequence(lit(0), greatest(n, lit(1)) - 1),
        i => concat_ws(" ", slice(toks, i * 2 + 1, lit(2))))).as("span"))
    }
    val keptSpans = spans(deduped)
    assert(keptSpans.groupBy("span").count().filter(col("count") > 1).isEmpty)
    assert(keptSpans.select("span").distinct().count()
      == spans(docs).select("span").distinct().count())
  }
}

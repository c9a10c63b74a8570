package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PackingSpec extends AnyFunSuite with SparkTestBase {

  private def docsDf = {
    import spark.implicits._
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
  }

  test("packPlan matches a sequential fold over (source, doc_id) order") {
    val got = Packing.packPlan(docsDf, "doc_id", "text", "source", tokenBudget = 64)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
      .toMap

    // reference: per source in doc_id order, running token offset
    val rows = got.toSeq.map { case ((s, id), (n, _, _)) => (s, id, n) }
      .sortBy { case (s, id, _) => (s, id) }
    var cum = Map.empty[String, Long].withDefaultValue(0L)
    rows.foreach { case (s, id, n) =>
      val before = cum(s)
      assert(got((s, id)) == ((n, before / 64, before % 64)),
        s"doc $id in $s: got ${got((s, id))}, cum_before $before")
      cum = cum.updated(s, before + n)
    }
    assert(got.values.forall(_._3 < 64))
    assert(got.nonEmpty)
  }

  test("packPlanSharded: offsets bounded, pack ids disjoint across shards") {
    val planned = Packing.packPlanSharded(
      docsDf, "doc_id", "text", "source", tokenBudget = 64, nShards = 4)
    val rows = planned.collect()
    assert(rows.length == docsDf.count())
    assert(rows.forall(_.getAs[Long]("pack_offset") < 64))
    // every (source, pack_id) belongs to exactly one shard
    val shardsPerPack = rows
      .groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("pack_id")))
      .map { case (_, g) => g.map(_.getAs[Long]("shard")).distinct.length }
    assert(shardsPerPack.forall(_ == 1))
    // shard pack-id RANGES are disjoint and ordered by shard within each
    // source (ids inside a range may legitimately skip — a doc longer
    // than the budget spans packs no later doc starts in)
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, g) =>
      val ranges = g.groupBy(_.getAs[Long]("shard")).toSeq
        .map { case (sh, rs) =>
          val ids = rs.map(_.getAs[Long]("pack_id"))
          (sh, ids.min, ids.max)
        }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, _, hiPrev), (_, loNext, _)) =>
          assert(hiPrev < loNext, s"source $s shard ranges overlap")
        case _ =>
      }
      assert(ranges.map(_._2).min == 0L, s"source $s does not start at pack 0")
    }
    // within a shard, same sequential-fold law as packPlan
    val byShard = rows.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("shard")))
    byShard.foreach { case (_, g) =>
      val inOrder = g.sortBy(_.getAs[Long]("doc_id"))
      var before = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("pack_offset") == before % 64)
        before += r.getAs[Long]("n_tokens")
      }
    }

    // the PHYSICAL invariant the id-disjointness check alone misses: a
    // doc's token interval [pack_id*budget + pack_offset, +n_tokens)
    // must never overlap another doc's within a source — a base offset
    // that counted STARTED packs instead of OCCUPIED packs let a
    // shard's tail tokens share a window with the next shard's pack 0
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, g) =>
      val iv = g.map { r =>
        val start = r.getAs[Long]("pack_id") * 64 + r.getAs[Long]("pack_offset")
        (start, start + r.getAs[Long]("n_tokens"))
      }.sortBy(_._1)
      iv.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(e1 <= s2, s"source $s: token intervals overlap ($e1 > $s2)")
        case _ =>
      }
    }
  }

  test("packPlanSharded: an overflowing shard tail never shares a pack window with the next shard") {
    import spark.implicits._
    // shard by doc_id parity; doc 0 (shard 0) spans four 8-token packs
    // from a single 25-token doc whose LOCAL pack ids stop at 0 — the
    // exact shape where a started-packs base aliased windows
    val docs = Seq(
      (0L, Array.fill(25)("w").mkString(" "), "s"),
      (1L, "a b c", "s"),
      (3L, "d e", "s")
    ).toDF("doc_id", "text", "source")
    val planned = Packing.packPlanSharded(
      docs, "doc_id", "text", "source", tokenBudget = 8, nShards = 2,
      shardBy = Some(pmod(col("doc_id"), lit(2L))))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"),
          r.getAs[Long]("pack_offset")))
      .toMap
    // shard 0: one doc, starts at pack 0; occupies ceil(25/8) = 4 packs
    assert(planned(0L) == ((0L, 0L, 0L)))
    // shard 1 must begin at pack 4 — pack ids 1..3 hold shard 0's tail
    assert(planned(1L) == ((1L, 4L, 0L)))
    assert(planned(3L) == ((1L, 4L, 3L)))
  }

  test("property: packPlanSharded invariants on random docs/budgets/shards") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // token counts include 0 (empty doc), boundary-exact and > budget;
    // sparse ids leave some shards empty under the modulo assignment
    val genCase = for {
      budget <- Gen.chooseNum(1, 24)
      nShards <- Gen.chooseNum(1, 5)
      n <- Gen.chooseNum(1, 30)
      docs <- Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(0L, 60L),
        Gen.frequency(
          3 -> Gen.const(0),
          2 -> Gen.const(budget),          // lands exactly on boundaries
          5 -> Gen.chooseNum(0, budget * 3)),
        Gen.oneOf("sA", "sB")))
    } yield (budget, nShards, docs.distinctBy(d => (d._3, d._1)))
    graft.PropCheck.check(Prop.forAll(genCase) { case (budget, nShards, docs) =>
      val df = docs.map { case (id, nTok, src) =>
        (id, Seq.fill(nTok)("w").mkString(" "), src)
      }.toDF("doc_id", "text", "source")
      val rows = Packing.packPlanSharded(df, "doc_id", "text", "source",
          tokenBudget = budget, nShards = nShards,
          shardBy = Some(pmod(col("doc_id"), lit(nShards.toLong))))
        .collect()
      val count = rows.length == docs.length
      val offs = rows.forall { r =>
        val o = r.getAs[Long]("pack_offset"); o >= 0 && o < budget
      }
      // (source, pack_id) never spans shards — even for zero-token docs
      // starting exactly on a pack boundary (the r10 occupied-pack fix)
      val disjoint = rows
        .groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("pack_id")))
        .forall { case (_, g) => g.map(_.getAs[Long]("shard")).distinct.length == 1 }
      // within (source, shard) in id order the docs are CONTIGUOUS in
      // token space and the shard opens on a pack boundary
      val fold = rows.groupBy(r =>
        (r.getAs[String]("source"), r.getAs[Long]("shard"))).forall { case (_, g) =>
        val inOrder = g.sortBy(_.getAs[Long]("doc_id"))
        val first = inOrder.head
        var pos = first.getAs[Long]("pack_id") * budget
        first.getAs[Long]("pack_offset") == 0L && inOrder.forall { r =>
          val ok = r.getAs[Long]("pack_id") * budget +
            r.getAs[Long]("pack_offset") == pos
          pos += r.getAs[Long]("n_tokens")
          ok
        }
      }
      // no token-interval overlap anywhere within a source
      val noOverlap = rows.groupBy(_.getAs[String]("source")).forall { case (_, g) =>
        val iv = g.map { r =>
          val s = r.getAs[Long]("pack_id") * budget + r.getAs[Long]("pack_offset")
          (s, s + r.getAs[Long]("n_tokens"))
        }.sortBy(_._1)
        iv.sliding(2).forall {
          case Array((_, e1), (s2, _)) => e1 <= s2
          case _ => true
        }
      }
      count && offs && disjoint && fold && noOverlap
    }, minSuccessful = 25)
  }

  test("packPlanSharded: trailing zero-token doc on a pack boundary keeps ids disjoint") {
    import spark.implicits._
    // shard 0 totals exactly 8 tokens (ceil = 1 pack) but its trailing
    // EMPTY doc starts pack 1 — the next shard must base at 2, not 1
    val docs = Seq(
      (0L, Array.fill(8)("w").mkString(" "), "s"),
      (2L, "", "s"),
      (1L, "a b", "s")
    ).toDF("doc_id", "text", "source")
    val planned = Packing.packPlanSharded(
      docs, "doc_id", "text", "source", tokenBudget = 8, nShards = 2,
      shardBy = Some(pmod(col("doc_id"), lit(2L))))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"),
          r.getAs[Long]("pack_offset")))
      .toMap
    assert(planned(0L) == ((0L, 0L, 0L)))
    assert(planned(2L) == ((0L, 1L, 0L))) // empty doc starts (and is) pack 1
    assert(planned(1L) == ((1L, 2L, 0L))) // shard 1 may not reuse pack 1
  }

  test("selectUnderTokenBudget keeps exactly the maximal quality-ranked prefix") {
    val budget = 200L
    val got = Packing.selectUnderTokenBudget(
        docsDf, "doc_id", "text", "source", tokenBudget = budget)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .toSet

    val scored = docsDf.select(col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n"),
        TextOps.qualityScore(col("text")).as("q"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n"), r.getAs[Double]("q")))

    val expected = scored.groupBy(_._1).toSeq.flatMap { case (s, g) =>
      val ranked = g.sortBy { case (_, id, _, q) => (-q, id) }
      var cum = 0L
      ranked.takeWhile { case (_, _, n, _) => cum += n; cum <= budget }
        .map { case (_, id, _, _) => (s, id) }.toSeq
    }.toSet
    assert(got == expected)
    // budget actually binds: every source kept strictly fewer than all docs
    val keptPerSource = got.groupBy(_._1).view.mapValues(_.size).toMap
    val allPerSource = scored.groupBy(_._1).view.mapValues(_.size).toMap
    assert(keptPerSource.values.sum < allPerSource.values.sum)
  }

  test("weightedSampleFilter: rate endpoints, gate parity, repartition-stable") {
    val d = docsDf
    val none = d.filter(TextOps.weightedSampleFilter(
      col("source"), col("text"), Map.empty, defaultPermille = 0)).count()
    val all = d.filter(TextOps.weightedSampleFilter(
      col("source"), col("text"), Map.empty, defaultPermille = 1000)).count()
    assert(none == 0 && all == d.count())

    // uniform 300‰ map ≡ the raw fingerprint gate
    val viaMap = d.filter(TextOps.weightedSampleFilter(
      col("source"), col("text"),
      (0 until 20).map(i => s"src$i" -> 300).toMap, defaultPermille = 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaGate = d.filter(
      graft.functions.GraftFunctions.fingerprint64(col("text")) % 1000 < 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaMap == viaGate)

    // content-hash gate is partitioning-independent (reproducible sampling)
    val repart = d.repartition(13).filter(TextOps.weightedSampleFilter(
      col("source"), col("text"),
      (0 until 20).map(i => s"src$i" -> 300).toMap, defaultPermille = 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == viaMap)

    require(
      try { TextOps.weightedSampleFilter(col("s"), col("t"), Map("a" -> 1001), 0); false }
      catch { case _: IllegalArgumentException => true })
  }
}

package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** CDC ordering-semantics pins (FIXTURES.md §B.4; reference EP3:
  * `src/pipes/postgres.rs:249-517`) and the loop≡declarative equivalence
  * that the scale path depends on.
  */
class CdcApplySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // changelog rows: (seq, op, id, v)
  private def log(rows: (Long, String, Long, String)*): DataFrame =
    rows.toSeq.toDF("seq", "op", "id", "v")

  private def emptyState: DataFrame =
    Seq.empty[(Long, String)].toDF("id", "v")

  private def result(df: DataFrame): Set[(Long, String)] =
    df.select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private val pk = Seq("id")
  private val vals = Seq("v")

  test("I,U,U same key → last-wins (adapter/mod.rs:258-269)") {
    val s = CdcApply.applyBatch(emptyState,
      log((1, "I", 1, "a"), (2, "U", 1, "b"), (3, "U", 1, "c")), pk)
    assert(result(s) == Set((1L, "c")))
  }

  test("I then D same batch → gone; D then I same batch → STILL gone (delete-after-upsert hazard)") {
    val s1 = CdcApply.applyBatch(emptyState, log((1, "I", 1, "a"), (2, "D", 1, "a")), pk)
    assert(result(s1) == Set.empty)
    // log order D before I, same batch: reference applies inserts first,
    // deletes second → delete still wins (pipes/postgres.rs:422-485)
    val s2 = CdcApply.applyBatch(emptyState, log((1, "D", 1, "a"), (2, "I", 1, "a")), pk)
    assert(result(s2) == Set.empty)
  }

  test("cross-batch resurrection: D in batch 1, I in batch 2 → present") {
    val s1 = CdcApply.applyBatch(emptyState, log((1, "D", 1, "x")), pk)
    val s2 = CdcApply.applyBatch(s1, log((2, "I", 1, "a")), pk)
    assert(result(s2) == Set((1L, "a")))
  }

  test("truncate wipes prior state but not its own batch's queued upserts") {
    val s1 = CdcApply.applyBatch(emptyState, log((1, "I", 1, "a"), (2, "I", 2, "b")), pk)
    // batch 2: truncate + one insert AFTER it and one BEFORE it in log order;
    // routing runs truncate immediately, queued upserts apply after → both land
    val s2 = CdcApply.applyBatch(s1, log((3, "I", 3, "c"), (4, "T", 0, ""), (5, "I", 5, "e")), pk)
    assert(result(s2) == Set((3L, "c"), (5L, "e")))
  }

  test("idempotence: replaying the same batch yields identical state (§2.6)") {
    val b = log((1, "I", 1, "a"), (2, "U", 1, "b"), (3, "D", 2, "x"))
    val once = CdcApply.applyBatch(emptyState, b, pk)
    val twice = CdcApply.applyBatch(once, b, pk)
    assert(result(once) == result(twice))
  }

  test("update replaces value (ReplacingMergeTree emulation)") {
    val s1 = CdcApply.applyBatch(emptyState, log((1, "I", 1, "a")), pk)
    val s2 = CdcApply.applyBatch(s1, log((2, "U", 1, "z")), pk)
    assert(result(s2) == Set((1L, "z")))
  }

  test("declarative single-pass final state ≡ batch loop, random logs") {
    val rnd = new scala.util.Random(42)
    val ops = Array("I", "U", "D")
    val events = (1L to 400L).map { seq =>
      val op = if (rnd.nextInt(20) == 0) "T" else ops(rnd.nextInt(3))
      (seq, op, (rnd.nextInt(12) + 1).toLong, s"v$seq")
    }
    val changelog = events.toDF("seq", "op", "id", "v")
    for (batchSize <- Seq(7L, 50L, 1000L)) {
      val looped = result(CdcApply.runLoop(changelog, pk, vals, batchSize))
      val declared = result(CdcApply.finalStateDeclarative(changelog, pk, vals, batchSize))
      assert(declared == looped, s"batchSize=$batchSize")
    }
  }

  test("property: declarative ≡ loop for random logs and batch sizes") {
    import org.scalacheck.{Gen, Prop}
    // Spark jobs per case are expensive: few cases, larger logs. The
    // per-case driver fold below is an independent plain-Scala oracle.
    val genLog: Gen[List[(Long, String, Long, String)]] = for {
      n <- Gen.chooseNum(1, 60)
      ops <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("I"), 5 -> Gen.const("U"),
        3 -> Gen.const("D"), 1 -> Gen.const("T")))
      keys <- Gen.listOfN(n, Gen.chooseNum(1L, 6L))
    } yield ops.zip(keys).zipWithIndex.map { case ((op, k), i) =>
      (i.toLong + 1, op, k, s"v${i + 1}")
    }

    def scalaOracle(log: List[(Long, String, Long, String)], batchSize: Long): Map[Long, String] = {
      var state = Map.empty[Long, String]
      log.groupBy(e => e._1 / batchSize).toSeq.sortBy(_._1).foreach { case (_, batch) =>
        if (batch.exists(_._2 == "T")) state = Map.empty
        val ups = batch.filter(e => e._2 == "I" || e._2 == "U")
          .groupBy(_._3).map { case (k, es) => k -> es.maxBy(_._1)._4 }
        state = state ++ ups
        state = state -- batch.filter(_._2 == "D").map(_._3)
      }
      state
    }

    graft.PropCheck.check(Prop.forAll(genLog, Gen.oneOf(3L, 10L, 100L)) {
      (log: List[(Long, String, Long, String)], batchSize: Long) =>
        val df = log.toDF("seq", "op", "id", "v")
        val got = result(CdcApply.finalStateDeclarative(df, pk, vals, batchSize))
        got == scalaOracle(log, batchSize).toSet.map((kv: (Long, String)) => (kv._1, kv._2))
    }, minSuccessful = 12)
  }

  test("fused one-shuffle user state ≡ changelog → declarative final state") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    for (batchSize <- Seq(64L, 200L)) {
      val fused = graft.cdc.Changelog.userStateFused(events, batchSize)
        .orderBy("user_id").collect().toSeq
      val generic = CdcApply.finalStateDeclarative(
        graft.cdc.Changelog.fromEvents(events),
        Seq("user_id"), Seq("last_ts", "total_value", "n_events"), batchSize)
        .orderBy("user_id").collect().toSeq
      assert(fused == generic, s"batchSize=$batchSize")
    }
  }
}

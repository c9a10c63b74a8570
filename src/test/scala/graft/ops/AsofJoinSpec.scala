package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** As-of join semantics: latest right row at-or-before, per key; ties;
  * no-match nulls; multi-column atomicity; single-shuffle plan. */
class AsofJoinSpec extends AnyFunSuite with SparkTestBase {

  test("latest at-or-before per key; exact-time match; no-match null") {
    import spark.implicits._
    val left = Seq(
      (1L, 1, 5L), (2L, 1, 2L), (3L, 2, 9L), (4L, 3, 1L)
    ).toDF("id", "k", "t")
    val right = Seq(
      (1, 3L, 30.0), (1, 5L, 50.0), (2, 1L, 10.0)
    ).toDF("k", "t", "v")

    val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 50.0),  // t=5: exact-time right row matches (<=)
      (2L, null),  // t=2: no right row yet
      (3L, 10.0),  // earlier right carried forward
      (4L, null))) // key with no right rows at all
  }

  test("multi-column values stay atomic: one right ROW wins, not per-column") {
    import spark.implicits._
    val left = Seq((1L, 1, 10L)).toDF("id", "k", "t")
    // later right row has a NULL in one column — the match must still be
    // that row's (a=null, b=2), never a mix reaching back to (a=1, b=1)
    val right = Seq(
      (1, 1L, Option(1.0), Option(1.0)),
      (1, 5L, None: Option[Double], Option(2.0))
    ).toDF("k", "t", "a", "b")
    val r = AsofJoin.asofJoin(left, right, "k", "t", Seq("a", "b")).collect().head
    assert(r.isNullAt(3) && r.getDouble(4) == 2.0)
  }

  test("ties among right rows at one (key, time) break by rightOrder") {
    import spark.implicits._
    val left = Seq((1L, 1, 5L)).toDF("id", "k", "t")
    val right = Seq((1, 5L, 7L, 70.0), (1, 5L, 9L, 90.0), (1, 5L, 8L, 80.0))
      .toDF("k", "t", "seq", "v")
    val r = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"),
      rightOrder = Some("seq")).collect().head
    assert(r.getDouble(3) == 90.0) // max seq wins deterministically
  }

  test("property: equals the brute-force per-row definition on random data") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val genRows = for {
      nL <- Gen.chooseNum(0, 40)
      nR <- Gen.chooseNum(0, 40)
      ls <- Gen.listOfN(nL, Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0L, 30L)))
      rs <- Gen.listOfN(nR, Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0L, 30L), Gen.chooseNum(0, 999)))
    } yield (ls, rs)
    graft.PropCheck.check(Prop.forAll(genRows) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "t")
      // unique (k, t, seq) tiebreak via index as both seq and value
      val right = rs.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong, i.toDouble) }
        .toDF("k", "t", "seq", "v")
      val got = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"),
        rightOrder = Some("seq"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      // brute force: per left row, max (t, seq) among right rows with
      // same key and t <= left.t
      val rIdx = rs.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong, i.toDouble) }
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rIdx.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (cands.isEmpty) None
          else Some(cands.maxBy(r => (r._2, r._3))._4))
      }.toMap
      got == want
    })
  }

  test("plan: exactly one shuffle exchange (no range-join explosion)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, i % 5, i.toLong)).toDF("id", "k", "t")
    val right = (1 to 50).map(i => (i % 5, i.toLong, i.toDouble)).toDF("k", "t", "v")
    val joined = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), s"range-join blowup:\n$plan")
    assert(joined.count() == 100)
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.ZOrderKernels

class LayoutSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("kernel matches the bit-by-bit reference on planted coordinates") {
    def reference(a: Long, b: Long): Long =
      (0 until 31).map(k =>
        (((a >> k) & 1L) << (2 * k)) | (((b >> k) & 1L) << (2 * k + 1)))
        .reduce(_ | _)
    // deterministic LCG walk over the coordinate space, plus the edges
    val edges = Seq(0L, 1L, 2L, ZOrderKernels.MaxCoord,
      ZOrderKernels.MaxCoord - 1, 0x55555555L, 0x2AAAAAAAL)
    var s = 12345L
    val walked = (0 until 200).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) & ZOrderKernels.MaxCoord
    }
    for (a <- edges ++ walked.take(20); b <- edges ++ walked.drop(180))
      assert(ZOrderKernels.interleave(a, b) == reference(a, b), s"($a, $b)")
    // the key stays non-negative: signed ordering IS curve ordering
    assert(ZOrderKernels.interleave(
      ZOrderKernels.MaxCoord, ZOrderKernels.MaxCoord) > 0L)
  }

  test("expression: out-of-range and null coordinates yield NULL, never a scrambled key") {
    val df = Seq(
      (1L, Some(3L), Some(5L)),
      (2L, Some(-1L), Some(5L)),
      (3L, Some(3L), Some(1L << 31)),
      (4L, None, Some(5L))).toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.GraftFunctions.interleaveBits(col("a"), col("b"))
          .as("z"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L).contains(ZOrderKernels.interleave(3L, 5L)))
    assert(rows(2L).isEmpty && rows(3L).isEmpty && rows(4L).isEmpty)
    // and the SQL registration answers too
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT interleave_bits(3L, 5L)").head.getLong(0) ==
      ZOrderKernels.interleave(3L, 5L))
  }

  test("k-dim kernel matches the bit-by-bit reference; widths keep the key non-negative") {
    def reference(vals: Seq[Long], dims: Int, bits: Int): Long =
      (for (d <- 0 until dims; k <- 0 until bits)
        yield ((vals(d) >> k) & 1L) << (k * dims + d)).reduce(_ | _)
    var s = 98765L
    def next(mask: Long): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) & mask
    }
    for (dims <- Seq(3, 4)) {
      val bits = ZOrderKernels.bitsForDims(dims)
      val max = ZOrderKernels.maxCoordForDims(dims)
      val edges = Seq(0L, 1L, max, max - 1)
      for (_ <- 0 until 50) {
        val vals = Array.fill(dims)(next(max))
        assert(ZOrderKernels.interleaveK(vals, dims) ==
          reference(vals.toSeq, dims, bits), vals.mkString(","))
      }
      // all-max coordinates still give a NON-NEGATIVE key (signed
      // ordering == curve ordering, the 2-D invariant generalized)
      assert(ZOrderKernels.interleaveK(Array.fill(dims)(max), dims) > 0L,
        s"$dims-dim all-max key must stay positive")
      val _ = edges
    }
  }

  test("interleave_bits_k expression: codegen matches kernel, nulls on range") {
    val df = Seq(
      (1L, Some(3L), Some(5L), Some(7L)),
      (2L, Some(-1L), Some(5L), Some(7L)),
      (3L, Some(3L), Some(1L << 21), Some(7L)),
      (4L, None, Some(5L), Some(7L))).toDF("id", "a", "b", "c")
      .select(col("id"), graft.functions.GraftFunctions.interleaveBitsK(
        Seq(col("a"), col("b"), col("c"))).as("z"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L).contains(ZOrderKernels.interleaveK(Array(3L, 5L, 7L), 3)))
    assert(rows(2L).isEmpty && rows(3L).isEmpty && rows(4L).isEmpty)
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT interleave_bits_k(3L, 5L, 7L, 2L)").head.getLong(0)
      == ZOrderKernels.interleaveK(Array(3L, 5L, 7L, 2L), 4))
  }

  test("rank bucketing: equal populations on a skewed domain where bucket31 collapses") {
    // zipf-ish: 90% of mass at tiny values, a long tail to 1e6
    val skewed = spark.range(1000L)
      .select(col("id"), (when(col("id") % 10 =!= 0, col("id") % 9)
        .otherwise(col("id") * col("id"))).cast("double").as("v"))
    // linear bucketing sends ~90% of rows to bucket 0
    val lin = skewed
      .select(Layout.bucket31(col("v"), 0.0, 1e6, 16).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lin(0L) >= 900L, s"expected bucket31 collapse, got $lin")
    // exact rank bucketing balances to ±1
    val rb = skewed
      .select(Layout.rankBucket(col("v"), col("id"), 16).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(rb.length == 16 && rb.max - rb.min <= 1L, rb.mkString(","))
    // the scale path (bounds + binary search) agrees with the exact
    // ranks up to boundary ties: every bucket within 2x of ideal
    val bounds = Layout.quantileBounds(skewed, "v", 16, exact = true)
    val bb = skewed
      .select(Layout.bucketByBounds(col("v"), bounds).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(bb.sum == 1000L)
    // value-based bounds cannot split a TIE RUN (equal values share a
    // bucket by definition), so the honest balance bound is ideal
    // population + the largest tie run — ntile's ±1 needs the total
    // order a rank has and a value does not
    val maxTie = skewed.groupBy("v").count()
      .agg(max("count")).head.getLong(0)
    assert(bb.max <= 1000L / 16L + maxTie,
      s"no bounds bucket may exceed ideal+maxTie: ${bb.mkString(",")} (tie $maxTie)")
    // bucketOf is the documented count-of-bounds-<=-v
    assert(ZOrderKernels.bucketOf(0.0, Array(1.0, 2.0, 3.0)) == 0L)
    assert(ZOrderKernels.bucketOf(2.0, Array(1.0, 2.0, 3.0)) == 2L)
    assert(ZOrderKernels.bucketOf(9.0, Array(1.0, 2.0, 3.0)) == 3L)
  }

  test("quantileBounds on an empty/all-null input fails clearly, not with an NPE") {
    val empty = spark.range(0).selectExpr("CAST(id AS DOUBLE) AS v")
    val e = intercept[IllegalArgumentException] {
      Layout.quantileBounds(empty, "v", 4, exact = true)
    }
    assert(e.getMessage.contains("quantileBounds"))
    val allNull = spark.range(5).selectExpr("CAST(NULL AS DOUBLE) AS v")
    intercept[IllegalArgumentException] {
      Layout.quantileBounds(allNull, "v", 4)
    }
  }

  test("BucketByBounds compares structurally: two same-bounds instances are equal") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // the bounds key is a Seq, not an Array — reference-compared arrays
    // would defeat canonicalization / common-subexpression elimination
    val a = graft.functions.BucketByBounds(Literal(2.5), Seq(1.0, 2.0))
    val b = graft.functions.BucketByBounds(Literal(2.5), Seq(1.0, 2.0))
    assert(a == b && a.semanticEquals(b))
    assert(a.canonicalized == b.canonicalized)
    assert(a.eval(null) == 2L && b.eval(null) == 2L)
  }

  test("3-dim z-layout clusters every axis: per-file spans shrink vs row-major") {
    val grid = spark.range(16L * 16L * 16L)
      .select((col("id") % 16).as("x"), ((col("id") / 16) % 16).as("y"),
        (col("id") / 256).as("z"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    grid.repartitionByRange(16, col("z") * 256 + col("y") * 16 + col("x"))
      .sortWithinPartitions(col("z") * 256 + col("y") * 16 + col("x"))
      .write.parquet(s"$tmp/rowmajor")
    Layout.zorderByN(grid, Seq(col("x"), col("y"), col("z")), numFiles = 16)
      .write.parquet(s"$tmp/zorder")
    def meanXSpan(dir: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x") + 1).as("xs"))
        .agg(avg("xs")).head.getDouble(0)
    assert(meanXSpan(s"$tmp/rowmajor") == 16.0)
    assert(meanXSpan(s"$tmp/zorder") <= 10.0,
      s"3-dim z-ordered files must cover compact x ranges, got ${meanXSpan(s"$tmp/zorder")}")
    // layout never changes results
    assert(spark.read.parquet(s"$tmp/zorder")
      .filter(col("x") < 4 && col("y") < 4 && col("z") < 4).count() == 64L)
    graft.SparkEntry.deleteRecursively(new java.io.File(tmp))
  }

  test("bucket31 clamps and scales a numeric domain into the coordinate range") {
    val df = Seq(-5.0, 0.0, 49.9, 99.9, 250.0).toDF("v")
      .select(Layout.bucket31(col("v"), 0.0, 100.0, 64).as("b"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 31L, 63L, 63L))
  }

  test("z-layout clusters BOTH axes: per-file bounding boxes shrink vs a row-major layout") {
    // a 64x64 grid in row-major order — the worst case for the y axis
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    grid.repartitionByRange(16, col("y") * 64 + col("x"))
      .sortWithinPartitions(col("y") * 64 + col("x"))
      .write.parquet(s"$tmp/rowmajor")
    Layout.zorderBy(grid, col("x"), col("y"), numFiles = 16)
      .write.parquet(s"$tmp/zorder")
    def meanArea(dir: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
          .as("area"))
      spans.agg(avg("area")).head.getDouble(0)
    }
    val rm = meanArea(s"$tmp/rowmajor")
    val zo = meanArea(s"$tmp/zorder")
    // row-major files span the full x axis (area ~64*4=256); z-ordered
    // files cover compact curve quadrants (16 files over a 64x64 grid =
    // 16x16 boxes, area 256... so compare along the MINOR axis instead:
    // the row-major x span is 64, the z-ordered x span is 16)
    def meanXSpan(dir: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x") + 1).as("xs"))
        .agg(avg("xs")).head.getDouble(0)
    val rmX = meanXSpan(s"$tmp/rowmajor")
    val zoX = meanXSpan(s"$tmp/zorder")
    assert(rmX == 64.0, s"row-major files span the full x axis, got $rmX")
    assert(zoX <= 20.0, s"z-ordered files must cover compact x ranges, got $zoX")
    // an x-box predicate therefore touches a minority of z-ordered files
    def filesTouching(dir: String, xLo: Int, xHi: Int): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("lo"), max("x").as("hi"))
        .filter(col("hi") >= xLo && col("lo") <= xHi).count()
    assert(filesTouching(s"$tmp/rowmajor", 0, 7) == 16L)
    assert(filesTouching(s"$tmp/zorder", 0, 7) <= 6L)
    // and the layout never changes results: same rows either way
    val a = spark.read.parquet(s"$tmp/zorder")
      .filter(col("x") < 8 && col("y") < 8).count()
    assert(a == 64L)
    assert(zo <= rm, s"z-ordered mean box area $zo vs row-major $rm")
    graft.SparkEntry.deleteRecursively(new java.io.File(tmp))
  }

  test("bucketed tables join and aggregate with ZERO shuffle exchanges") {
    import spark.implicits._
    val facts = (1 to 4000).map(i => (i.toLong % 97, i.toLong, s"v$i"))
      .toDF("k", "seq", "payload")
    val dims = (0L until 97L).map(k => (k, s"dim$k")).toDF("dk", "name")
    graft.ops.Layout.writeBucketed(facts, "graft_spec_facts_b", "k", 8)
    graft.ops.Layout.writeBucketed(dims, "graft_spec_dims_b", "dk", 8)
    try {
      // merge hint keeps the small side off the broadcast path — the
      // point is the co-partitioned sort-merge plan, not a broadcast
      val joined = spark.table("graft_spec_facts_b")
        .join(spark.table("graft_spec_dims_b").hint("merge"),
          col("k") === col("dk"))
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed equi-join must plan no exchange:\n$plan")
      // an aggregation on the bucket key is exchange-free too
      val agg = spark.table("graft_spec_facts_b")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      val aggEx = agg.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(aggEx.isEmpty, "bucket-key aggregation must plan no exchange")
      // and the layout never changes results
      assert(joined.count() == 4000L)
      assert(agg.agg(sum(col("n"))).head.getLong(0) == 4000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_spec_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_spec_dims_b")
    }
  }
}

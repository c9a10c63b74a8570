package graft.ops

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The reliable-checkpoint seam (r7 verdict item 4): every iterative
  * pin site (`clusterPairs` rounds, CDC fold state, streaming batches)
  * goes through [[Checkpoints.pin]], which flips from executor-local
  * blocks to reliable filesystem checkpoints on one session conf. */
class CheckpointsSpec extends AnyFunSuite with SparkTestBase {

  private def withConf[A](key: String, value: Option[String])(f: => A): A = {
    val old = spark.conf.getOption(key)
    value match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    try f
    finally {
      spark.conf.unset(key)
      old.foreach(spark.conf.set(key, _))
    }
  }

  test("default mode: pin materializes locally, writes nothing to any dir") {
    import spark.implicits._
    withConf(Checkpoints.ConfKey, None) {
      assert(!Checkpoints.isReliable(spark))
      val pinned = Checkpoints.pin((1L to 10L).toDF("id"))
      assert(pinned.agg(sum(col("id"))).head.getLong(0) == 55L)
    }
  }

  test("configured dir: pin writes a reliable checkpoint under it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt").toString
    withConf(Checkpoints.ConfKey, Some(dir)) {
      assert(Checkpoints.isReliable(spark))
      val pinned = Checkpoints.pin((1L to 10L).toDF("id"))
      assert(pinned.agg(sum(col("id"))).head.getLong(0) == 55L)
      // the eager checkpoint must have landed ON the shared dir — that
      // is the whole point: blocks an executor loss cannot destroy
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).nonEmpty,
        s"no checkpoint files under $dir")
    }
  }

  test("clusterPairs honors the seam: reliable rounds, same clusters") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt-cp").toString
    // driverMaxEdges = 0: the seam under test is the iterative loop's
    // round pins — the r17 driver fast path runs no rounds at all
    val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val expect = graft.dedup.Dedup.clusterPairs(pairs, driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = withConf(Checkpoints.ConfKey, Some(dir)) {
      graft.dedup.Dedup.clusterPairs(pairs, driverMaxEdges = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == expect)
  }
}

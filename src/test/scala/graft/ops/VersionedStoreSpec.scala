package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sim.IvfIndex

/** Pins the cutover contract [[VersionedStore]] ships for the
  * [[GrowthPolicy]] recommend-only actions: crash-during-cutover leaves
  * the old version serving, success flips resolution atomically-by-
  * construction (highest committed wins), retirement sweeps
  * predecessors AND crashed remnants but never the serving version. */
class VersionedStoreSpec extends AnyFunSuite with SparkTestBase {

  private def emb =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))

  private def committed: String => Boolean =
    d => IvfIndex.readMeta(spark, d).isDefined

  test("cutover lifecycle: crash keeps old serving; success flips; retire sweeps") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore").toString

    // nothing serves an empty root
    assert(VersionedStore.current(spark, root, committed).isEmpty)
    assert(VersionedStore.retire(spark, root, committed).isEmpty)

    // v1: the initial build
    val v1 = VersionedStore.cutover(spark, root, committed) { dir =>
      IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    }
    assert(v1.endsWith("/v1"))
    assert(VersionedStore.current(spark, root, committed).contains(v1))
    val q = emb.filter(col("vec_id") % 100 === 0)
    def topIds(dir: String) = IvfIndex.topK(spark, dir, q,
        "vec_id", "embedding", k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val served1 = topIds(v1)
    assert(served1.nonEmpty)

    // v2: a RETRAIN cutover that crashes mid-build — data lands, the
    // commit marker does not
    intercept[RuntimeException] {
      VersionedStore.cutover(spark, root, committed) { dir =>
        emb.limit(5).select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("vec"),
            lit(0).as("list"))
          .write.parquet(s"$dir/vectors")
        throw new RuntimeException("executor lost mid-retrain")
      }
    }
    // the old version keeps serving, byte-identically
    assert(VersionedStore.current(spark, root, committed).contains(v1))
    assert(topIds(v1) == served1)

    // a build that "returns" without committing (and writes nothing) is
    // refused loudly
    intercept[IllegalArgumentException] {
      VersionedStore.cutover(spark, root, committed)(_ => ())
    }

    // v3: the successful retrain (the GrowthPolicy Retrain/Rebucket
    // shape — more lists, fresh dir); numbered PAST the crashed v2
    val v3 = VersionedStore.cutover(spark, root, committed) { dir =>
      IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 8)
    }
    assert(v3.endsWith("/v3"))
    assert(VersionedStore.current(spark, root, committed).contains(v3))
    assert(topIds(v3).nonEmpty)

    // retire: v1 (committed predecessor) and v2 (crashed remnant) go;
    // v3 keeps serving
    val gone = VersionedStore.retire(spark, root, committed)
    assert(gone.map(_.split('/').last).toSet == Set("v1", "v2"))
    assert(VersionedStore.current(spark, root, committed).contains(v3))
    assert(!new java.io.File(v1).exists())
    assert(topIds(v3).nonEmpty)
    // idempotent
    assert(VersionedStore.retire(spark, root, committed).isEmpty)
  }
}

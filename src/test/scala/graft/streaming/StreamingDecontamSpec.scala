package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.dedup.ExactCatalog

class StreamingDecontamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val evalDocs = Seq(
    100L -> "the capital of france is paris obviously",
    101L -> "two plus two equals four in base ten").toDF("doc_id", "text")

  test("eval overlap drops at minHits; clean docs survive; the registry never advances") {
    val dir = Files.createTempDirectory("graft-dc").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text")
    val batch = Seq(
      1L -> "the capital of france is paris obviously", // exact eval copy
      // carries ONE eval trigram ("plus two equals") in fresh text
      2L -> "students wrote plus two equals on the board today",
      3L -> "a wholly unrelated training document about rivers").toDF("doc_id", "text")
    var delivered: Set[Long] = null
    val out = StreamingDecontam.applyBatch(batch, dir, "doc_id", "text",
      deliver = d => delivered = d.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(3L))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L))
    // minHits = 2: the single-trigram doc now passes, the full copy drops
    assert(StreamingDecontam.applyBatch(batch, dir, "doc_id", "text",
      minHits = 2L).select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    // READ-ONLY: the probe added nothing to the registry
    val regCount = ExactCatalog.read(spark, dir,
      kind = StreamingDecontam.kindFor(3)).count()
    val _ = StreamingDecontam.applyBatch(batch, dir, "doc_id", "text")
    assert(ExactCatalog.read(spark, dir,
      kind = StreamingDecontam.kindFor(3)).count() == regCount)
  }

  test("n is a layout property: meta-derived width wins over a divergent caller") {
    val dir = Files.createTempDirectory("graft-dc-n").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text", n = 3)
    assert(StreamingDecontam.metaN(spark, dir).contains(3))
    // caller passes n=5 — the probe still shingles at the registry's 3,
    // so the eval copy drops
    val out = StreamingDecontam.applyBatch(
      Seq(1L -> evalDocs.as[(Long, String)].head()._2).toDF("doc_id", "text"),
      dir, "doc_id", "text", n = 5)
    assert(out.count() == 0)
  }

  test("kind universe guard both ways; an empty registry passes everything") {
    val dir = Files.createTempDirectory("graft-dc-k").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text")
    val e = intercept[IllegalArgumentException] { ExactCatalog.read(spark, dir) }
    assert(e.getMessage.contains(StreamingDecontam.kindFor(3)))
    val empty = Files.createTempDirectory("graft-dc-e").toString + "/none"
    assert(StreamingDecontam.applyBatch(
      Seq(1L -> "anything at all goes through").toDF("doc_id", "text"),
      empty, "doc_id", "text").count() == 1)
  }
}

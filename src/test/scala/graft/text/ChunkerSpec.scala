package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import graft.{PropCheck, SparkTestBase}

class ChunkerSpec extends AnyFunSuite with SparkTestBase {

  private val size = 10
  private val overlap = 3
  private val step = size - overlap

  /** Local reference: starts 0, step, …, last = ⌈(len−size)/step⌉ (0 if
    * len ≤ size); chunk = substring(start, start+size) clamped. */
  private def refChunks(text: String): Seq[(Int, String)] = {
    val len = text.length
    val last = if (len <= size) 0 else math.ceil((len - size).toDouble / step).toInt
    (0 to last).map(i => i -> text.substring(
      math.min(i * step, len), math.min(i * step + size, len)))
  }

  test("chunks match the reference and cover every char (property)") {
    val texts = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(50)),
      Gen.listOf(Gen.oneOf("ab", " ", "日本", "x")).map(_.mkString.take(40)),
      Gen.const(""))
    PropCheck.check(Prop.forAll(Gen.listOfN(5, texts)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Chunker.chunkDocs(df, "doc_id", "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1).toInt, r.getString(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(c => (c._2, c._3)).toSeq).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val want = refChunks(t)
        val ok = got.getOrElse(i.toLong, Seq.empty) == want
        // coverage: concatenating chunks with the overlap removed
        // rebuilds the document
        val rebuilt = want.map(_._2).zipWithIndex.map { case (c, j) =>
          if (j == 0) c else c.drop(math.min(overlap, c.length))
        }.mkString
        // rebuilt may exceed the doc only if a trailing chunk re-covers
        ok && (t.isEmpty || rebuilt == t ||
          rebuilt.length >= t.length && t.startsWith(rebuilt.take(t.length)))
      }
    }, minSuccessful = 30)
  }

  test("consecutive chunks overlap by exactly `overlap` chars on full docs") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 3 // 78 chars
    val chunks = Chunker.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, overlap)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    chunks.sliding(2).foreach {
      case Array(a, b) if b.length >= overlap =>
        assert(a.takeRight(overlap) == b.take(overlap))
      case _ =>
    }
  }

  test("streaming chunking == batch chunking (stateless scan)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "tiny"), (3L, ""))
    val input = MemoryStream[(Long, String)]
    val q = Chunker.chunkDocs(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", size, overlap)
      .writeStream.format("memory").queryName("chunk_mem").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table("chunk_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = Chunker.chunkDocs(docs.toDF("doc_id", "text"),
          "doc_id", "text", size, overlap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(stream == batch)
    } finally q.stop()
  }
}

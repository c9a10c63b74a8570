package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{WarcFixtures, WarcKernels}
import java.nio.charset.StandardCharsets.UTF_8

class WarcSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def rowsOf(b: Array[Byte]): Seq[(String, String, String)] = {
    val arr = WarcKernels.warcRecords(b)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      (r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
        new String(r.getBinary(4), UTF_8))
    }
  }

  test("roundtrip: plain and gzip-member framings parse identically, WET carries raw text") {
    val body = "the quick brown fox\njumps twice".getBytes(UTF_8)
    val plain = WarcFixtures.syntheticWarc(7L, 0, body)
    val gz = WarcFixtures.syntheticWarc(7L, 1, body)
    assert(!java.util.Arrays.equals(plain, gz), "framings must differ bytewise")
    val p = rowsOf(plain)
    assert(p == rowsOf(gz), "gzip members must parse byte-identically to plain")
    assert(p.map(_._1) == Seq("warcinfo", "request", "response"))
    assert(p(1)._2 == "http://example.com/doc/7" && p(2)._2 == p(1)._2)
    assert(p(0)._2 == null, "warcinfo carries no target URI")
    // the response block is a full HTTP message wrapping the body
    val http = WarcKernels.httpResponse(
      p(2)._3.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(http.getInt(0) == 200)
    assert(http.getUTF8String(1).toString == "text/plain")
    assert(new String(http.getBinary(2), UTF_8) == new String(body, UTF_8))
    // WET variant: warcinfo + one conversion record whose block IS the text
    val wet = rowsOf(WarcFixtures.syntheticWarc(7L, 2, body))
    assert(wet.map(_._1) == Seq("warcinfo", "conversion"))
    assert(wet(1)._3 == new String(body, UTF_8))
  }

  test("whole-file refusal on every malformation class") {
    val good = WarcFixtures.syntheticWarc(3L, 0, "abc def".getBytes(UTF_8))
    assert(WarcKernels.warcRecords(good) != null)
    // bad version line
    val badVer = good.clone(); badVer(0) = 'X'
    assert(WarcKernels.warcRecords(badVer) == null)
    // truncated mid-block
    assert(WarcKernels.warcRecords(
      java.util.Arrays.copyOf(good, good.length - 10)) == null)
    // missing the inter-record double-CRLF (chop the final one)
    assert(WarcKernels.warcRecords(
      java.util.Arrays.copyOf(good, good.length - 2)) == null)
    // header line without a colon
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val noColon = s.replaceFirst("WARC-Type: warcinfo", "WARC-Type warcinfo")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(WarcKernels.warcRecords(noColon) == null)
    // non-numeric content-length
    val badLen = s.replaceFirst("Content-Length: ", "Content-Length: x")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(WarcKernels.warcRecords(badLen) == null)
    // corrupt gzip (magic intact, body garbage)
    val gz = WarcFixtures.syntheticWarc(3L, 1, "abc".getBytes(UTF_8))
    val corrupt = gz.clone()
    var i = 20
    while (i < corrupt.length) { corrupt(i) = (corrupt(i) ^ 0x5a).toByte; i += 7 }
    assert(WarcKernels.warcRecords(corrupt) == null)
    // trailing garbage AFTER valid members: refuse, never a silent prefix
    assert(WarcKernels.warcRecords(gz ++ Array[Byte](1, 2, 3)) == null)
    // a corrupt LATER member refuses the WHOLE file (GZIPInputStream
    // would have treated the bad next-header as clean EOF and silently
    // dropped the tail — the manual member walk must not)
    val gz2 = WarcFixtures.syntheticWarc(4L, 1, "def".getBytes(UTF_8))
    val two = gz ++ gz2
    assert(WarcKernels.warcRecords(two).numElements() == 6,
      "two concatenated segments parse as six records")
    val badTail = two.clone()
    var j = gz.length + 20
    while (j < badTail.length) { badTail(j) = (badTail(j) ^ 0x5a).toByte; j += 7 }
    assert(WarcKernels.warcRecords(badTail) == null)
    // a flipped payload byte fails the member CRC even when the deflate
    // stream stays decodable
    val gzp = WarcFixtures.syntheticWarc(5L, 1, "payload body".getBytes(UTF_8))
    val lastByteFlips = gzp.clone()
    lastByteFlips(gzp.length - 1) = (lastByteFlips(gzp.length - 1) ^ 1).toByte
    assert(WarcKernels.warcRecords(lastByteFlips) == null,
      "a corrupted ISIZE/CRC trailer must refuse")
    // empty file = zero records, NOT a refusal
    assert(WarcKernels.warcRecords(Array.emptyByteArray).numElements() == 0)
    // http layer refusals
    assert(WarcKernels.httpResponse("not http".getBytes(UTF_8)) == null)
    assert(WarcKernels.httpResponse("HTTP/1.1 abc OK\r\n\r\n".getBytes(UTF_8)) == null)
  }

  test("gunzip member walk: optional header fields, roundtrip and corruption-safety properties") {
    import java.util.zip.{CRC32, Deflater}
    // hand-built member with FEXTRA + FNAME + FCOMMENT + FHCRC — the
    // JDK's GZIPOutputStream never emits these, so the header-skipping
    // paths need a custom fixture
    def memberWithExtras(payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16 | 2).toByte))
      out.write(new Array[Byte](6)) // MTIME + XFL + OS
      out.write(Array[Byte](3, 0)) // XLEN = 3
      out.write(Array[Byte](9, 9, 9)) // extra payload
      out.write("name.warc".getBytes("US-ASCII")); out.write(0)
      out.write("a comment".getBytes("US-ASCII")); out.write(0)
      out.write(Array[Byte](0x42, 0x42)) // FHCRC (not validated, skipped)
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](1024)
      var n = d.deflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = d.deflate(buf) }
      d.end()
      val crc = new CRC32; crc.update(payload)
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      out.write(le32(crc.getValue)); out.write(le32(payload.length.toLong))
      out.toByteArray
    }
    def gzipPlain(payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(payload); gz.close(); bos.toByteArray
    }
    val p1 = "first payload".getBytes("UTF-8")
    val p2 = "and a second one".getBytes("UTF-8")
    val mixed = memberWithExtras(p1) ++ gzipPlain(p2)
    assert(java.util.Arrays.equals(WarcKernels.gunzipAll(mixed), p1 ++ p2),
      "extras-laden member + plain member must inflate losslessly")

    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val payloadGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray)
    val membersGen = Gen.nonEmptyListOf(payloadGen).map(_.take(4))
    val roundtrip = Prop.forAll(membersGen) { ps =>
      val stream = ps.map(gzipPlain).reduce(_ ++ _)
      java.util.Arrays.equals(
        WarcKernels.gunzipAll(stream), ps.reduce(_ ++ _))
    }
    assert(scCheck(Parameters.default.withMinSuccessfulTests(40), roundtrip).passed)
    // corruption safety: flipping ANY single byte either refuses (null)
    // or yields the IDENTICAL output (non-validated header bytes like
    // MTIME) — NEVER a different successful parse
    val safety = Prop.forAll(membersGen, Gen.chooseNum(0, 1 << 20)) { (ps, seed) =>
      val stream = ps.map(gzipPlain).reduce(_ ++ _)
      val want = ps.reduce(_ ++ _)
      val at = seed % stream.length
      val bad = stream.clone()
      bad(at) = (bad(at) ^ (1 + (seed % 255))).toByte
      val got = WarcKernels.gunzipAll(bad)
      got == null ||
        (got.length == want.length && java.util.Arrays.equals(got, want)) ||
        // the corrupted byte may turn the stream non-gzip entirely
        // (magic byte flip) — then the identity fallback returns `bad`
        (at <= 1 && java.util.Arrays.equals(got, bad))
    }
    assert(scCheck(Parameters.default.withMinSuccessfulTests(120), safety).passed)
  }

  test("property: parse is framing-invariant and lossless across random bodies") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val bodyGen = Gen.listOf(Gen.frequency(
      9 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\n'),
      1 -> Gen.oneOf('é', '中', 'ß'))).map(_.mkString)
    val prop = Prop.forAll(Gen.choose(0L, 10000L), bodyGen) { (seed, body) =>
      val bytes = body.getBytes(UTF_8)
      val p = rowsOf(WarcFixtures.syntheticWarc(seed, 0, bytes))
      val g = rowsOf(WarcFixtures.syntheticWarc(seed, 1, bytes))
      val http = WarcKernels.httpResponse(
        WarcKernels.warcRecords(WarcFixtures.syntheticWarc(seed, 0, bytes))
          .getStruct(2, 5).getBinary(4))
      p == g && p.length == 3 &&
        new String(http.getBinary(2), UTF_8) == body
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming front door: segments become micro-batches, curate drops a cross-segment duplicate") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingCurate
    val root = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    val seg = root.resolve("segments"); java.nio.file.Files.createDirectory(seg)
    def put(name: String, seed: Long, body: String): Unit =
      java.nio.file.Files.write(seg.resolve(name),
        WarcFixtures.syntheticWarc(seed, 1, body.getBytes(UTF_8)))
    val bodyA = "alpha beta gamma delta epsilon zeta"
    val bodyB = "one two three four five six seven"
    put("seg-000.warc.gz", 1L, bodyA)
    put("seg-001.warc.gz", 2L, bodyB)

    val cfg = StreamingCurate.CurateConfig(
      s"$root/exact", s"$root/near", s"$root/substr",
      "doc_id", "text", w = 5, jaccardThreshold = 0.8)
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def runPass(): Unit = {
      val docs = Warc.responsesStream(spark, seg.toString + "/*.warc.gz")
        .select(
          regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
          col("payload").cast("string").as("text"))
      val q = StreamingCurate.writer(docs, cfg, s"$root/ckpt",
        Trigger.AvailableNow()) { batch =>
        delivered ++= batch.select(col("doc_id"), col("clean_text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
      }.start()
      q.awaitTermination()
    }
    runPass()
    assert(delivered.toSet == Set(1L -> bodyA, 2L -> bodyB))

    // a later crawl pass lands two more segments: one byte-different
    // re-crawl of doc 1's TEXT (exact dup by content) and one fresh doc.
    // The checkpoint must skip the already-processed segments; the exact
    // catalog must drop the re-crawl ACROSS micro-batches.
    delivered.clear()
    put("seg-002.warc.gz", 7L, bodyA) // same text, different url/doc
    put("seg-003.warc.gz", 8L, "brand new content entirely here")
    runPass()
    assert(delivered.toSet == Set(8L -> "brand new content entirely here"),
      s"re-crawled duplicate must drop against the persistent catalog: $delivered")
    spark.streams.active.foreach(_.stop())
  }

  test("crash/replay: a checkpoint rollback re-delivers segments without double-inserting catalogs or double-counting stats") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.{StreamingCurate, StreamingSketch, StreamingDistinct}
    val root = java.nio.file.Files.createTempDirectory("graft-warc-replay")
    val seg = root.resolve("segments"); java.nio.file.Files.createDirectory(seg)
    def put(name: String, seed: Long, body: String): Unit =
      java.nio.file.Files.write(seg.resolve(name),
        WarcFixtures.syntheticWarc(seed, 1, body.getBytes(UTF_8)))
    put("seg-000.warc.gz", 1L, "alpha beta gamma delta epsilon zeta")
    put("seg-001.warc.gz", 2L, "one two three four five six seven")
    val cfg = StreamingCurate.CurateConfig(
      s"$root/exact", s"$root/near", s"$root/substr",
      "doc_id", "text", w = 5, jaccardThreshold = 0.8,
      statsDir = Some(s"$root/stats"))
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runPass(ckpt: String): Unit = {
      val docs = Warc.responsesStream(spark, seg.toString + "/*.warc.gz")
        .select(
          regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
          col("payload").cast("string").as("text"))
      val q = StreamingCurate.writer(docs, cfg, ckpt, Trigger.AvailableNow()) {
        batch => delivered ++= batch.select(col("doc_id")).as[Long].collect()
      }.start()
      q.awaitTermination()
    }
    runPass(s"$root/ckpt")
    assert(delivered.sorted == Seq(1L, 2L))
    def exactDistinct(): Long = graft.dedup.ExactCatalog.read(spark,
      s"$root/exact").select("fp", "h2").distinct().count()
    def cmsTotal(): Long =
      StreamingSketch.read(spark, s"$root/stats/cms").get.totalCount()
    val (d0, c0) = (exactDistinct(), cmsTotal())
    val hll0 = StreamingDistinct.estimate(spark, s"$root/stats/hll")
    // CHECKPOINT ROLLBACK: lose the file-source checkpoint entirely —
    // the next run re-discovers and re-delivers BOTH segments under a
    // fresh batch id. The curate topology must hold its contracts
    // anyway: first-delivery-wins (the exact catalog re-drops the
    // replayed docs), catalog distinct keys unchanged, stats unchanged
    // (a suppressed replay contributes zero grams).
    delivered.clear()
    runPass(s"$root/ckpt-after-rollback")
    assert(delivered.isEmpty,
      s"replayed segments must be suppressed by the catalogs: $delivered")
    assert(exactDistinct() == d0, "replay must not add catalog keys")
    assert(cmsTotal() == c0, "replay must not double-count CMS stats")
    assert(StreamingDistinct.estimate(spark, s"$root/stats/hll") == hll0,
      "replay must not change the HLL estimate")
  }

  test("WARC headers decode as UTF-8: a multi-byte Target-URI surfaces intact, framing unshifted") {
    // build a record whose WARC-Target-URI carries multi-byte UTF-8
    // (IRI per ISO 28500 §4 — headers are UTF-8, not Latin-1); the
    // Content-Length framing is byte-based, so the record must parse
    // with the URI intact AND the neighbouring record unaffected
    val uri = "http://example.com/café/中文?q=żółć"
    val crlf = "\r\n"
    val block = "plain body".getBytes(UTF_8)
    val rec =
      (s"WARC/1.0${crlf}WARC-Type: resource${crlf}WARC-Target-URI: $uri$crlf" +
        s"Content-Length: ${block.length}$crlf$crlf").getBytes(UTF_8) ++
        block ++ s"$crlf$crlf".getBytes(UTF_8)
    val tail = WarcFixtures.syntheticWarc(9L, 0, "tail doc".getBytes(UTF_8))
    val arr = WarcKernels.warcRecords(rec ++ tail)
    assert(arr != null && arr.numElements() == 4)
    assert(arr.getStruct(0, 5).getUTF8String(1).toString == uri,
      "multi-byte UTF-8 in WARC headers must not surface as mojibake")
    assert(arr.getStruct(3, 5).getUTF8String(0).toString == "response",
      "byte-based framing must be unshifted by multi-byte header values")
  }

  test("gunzipAll refuses (null) past the inflated-size cap instead of dying mid-allocation") {
    def gzipPlain(payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(payload); gz.close(); bos.toByteArray
    }
    val small = ("x" * 1000).getBytes(UTF_8)
    val member = gzipPlain(small)
    // under the cap: inflates fine
    assert(java.util.Arrays.equals(WarcKernels.gunzipAll(member, 2000), small))
    // over the cap: whole-file refusal, not an exception — and the cap
    // applies to the CUMULATIVE stream, so a second member trips it too
    assert(WarcKernels.gunzipAll(member, 999) == null)
    assert(WarcKernels.gunzipAll(member ++ member, 1500) == null)
    // the production entry point wires the array-limit cap
    assert(WarcKernels.MaxInflatedBytes == Int.MaxValue - 16)
  }

  test("corruptSegments: the accounting view survives the filtered responses/wetText composition") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-corrupt")
    def put(name: String, b: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), b)
    put("seg-0.warc.gz", WarcFixtures.syntheticWarc(1L, 1, "alpha".getBytes(UTF_8)))
    put("seg-bad1.warc.gz", "garbage one".getBytes(UTF_8))
    put("seg-bad2.warc.gz", Array[Byte](0x1f, 0x8b.toByte, 8, 0, 1, 2, 3))
    // batch: responses() drops the refusal rows; corruptSegments keeps
    // them countable off the same path
    assert(Warc.responses(spark, dir.toString + "/*").count() == 1)
    val bad = Warc.corruptSegments(spark, dir.toString + "/*")
      .as[String].collect().map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
    assert(bad.toSeq == Seq("seg-bad1.warc.gz", "seg-bad2.warc.gz"))
    // streaming: the refusal count rides its own sink next to the
    // filtered topology — same scan contract, separate checkpoint
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = Warc.corruptSegmentsStream(spark, dir.toString + "/*.warc.gz")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt-corrupt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= batch.as[String].collect()
        ()
      }.start()
    q.awaitTermination()
    assert(seen.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted.toSeq ==
      Seq("seg-bad1.warc.gz", "seg-bad2.warc.gz"))
  }

  test("Warc.records/responses/wetText read segment files; corrupt files surface as null rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-spec")
    def put(name: String, b: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), b)
    put("seg-0.warc.gz", WarcFixtures.syntheticWarc(1L, 1, "alpha beta".getBytes(UTF_8)))
    put("seg-1.warc.gz", WarcFixtures.syntheticWarc(2L, 1, "gamma".getBytes(UTF_8)))
    put("seg-2.warc.wet.gz", WarcFixtures.syntheticWarc(3L, 2, "delta eps".getBytes(UTF_8)))
    put("seg-bad.warc.gz", "totally not a warc".getBytes(UTF_8))
    // a legitimately EMPTY segment: zero records, NOT a refusal — it
    // must neither add rows nor inflate the corrupt count
    put("seg-empty.warc.gz", Array.emptyByteArray)
    val recs = Warc.records(spark, dir.toString + "/*")
    assert(recs.count() == 3 + 3 + 2 + 1)
    // the corrupt segment is COUNTABLE, not silently absent
    val bad = recs.filter(col("rec_type").isNull).select(col("path")).as[String].collect()
    assert(bad.length == 1 && bad(0).endsWith("seg-bad.warc.gz"))
    val resp = Warc.responses(spark, dir.toString + "/*")
      .orderBy(col("url"))
      .select(col("url"), col("status"), col("mime"),
        col("payload").cast("string").as("text"),
        date_format(col("fetch_ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts"))
      .as[(String, Int, String, String, String)].collect()
    assert(resp.toSeq == Seq(
      ("http://example.com/doc/1", 200, "text/plain", "alpha beta", "2026-08-16T00:00:01"),
      ("http://example.com/doc/2", 200, "text/plain", "gamma", "2026-08-16T00:00:02")))
    val wet = Warc.wetText(spark, dir.toString + "/*")
      .select(col("url"), col("text")).as[(String, String)].collect()
    assert(wet.toSeq == Seq(("http://example.com/doc/3", "delta eps")))
    // SQL-registered too
    spark.sql("SELECT 1").collect() // session warm
    val viaSql = spark.sql(
      s"SELECT size(warc_records(content)) FROM binaryFile.`${dir.toString}/seg-0.warc.gz`")
      .collect().head.getInt(0)
    assert(viaSql == 3)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

class HashExprsSpec extends AnyFunSuite with SparkTestBase {

  // plain-Scala reference implementations to pin the kernels
  private def refFingerprint(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % GraftHash.FpMod)

  private def refFnv(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xff)) * 0x100000001b3L)

  test("fingerprint64 kernel matches reference fold; stable values") {
    for (s <- Seq("", "a", "hello world", "üñïçødé ☃", "x" * 10000)) {
      assert(GraftHash.fingerprint64(UTF8String.fromString(s)) == refFingerprint(s))
    }
    // pinned value: regression guard for cross-version stability
    assert(GraftHash.fingerprint64(UTF8String.fromString("hello")) == refFingerprint("hello"))
  }

  test("fnv1a64 matches reference; distinct inputs disperse") {
    val xs = (1 to 100).map(i => s"token$i")
    assert(xs.map(refFnv).distinct.size == 100)
    xs.foreach(s => assert(GraftHash.fnv1a64(UTF8String.fromString(s)) == refFnv(s)))
  }

  test("expressions work through SQL + Column API, codegen and eval agree") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox"),
      ("b", "the quick brown fox"),
      ("c", "utterly different content here")
    ).toDF("id", "text")

    // SQL-text path
    df.createOrReplaceTempView("hashdocs")
    val viaSql = spark.sql(
      "SELECT id, fingerprint64(text) f, simhash64(split(text, ' ')) s FROM hashdocs")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(viaSql("a")._1 == viaSql("b")._1) // identical text, identical fp
    assert(viaSql("a")._1 != viaSql("c")._1)
    assert(viaSql("a")._2 == viaSql("b")._2)

    // Column API path agrees
    val viaCol = df.select($"id",
      GraftFunctions.fingerprint64($"text").as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaCol == viaSql.map { case (k, v) => k -> v._1 })

    // eval (interpreted) path agrees with codegen results
    assert(viaSql("a")._1 == refFingerprint("the quick brown fox"))
  }

  test("GraftExtensions injects every builder with working constructors") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // builders construct the right expressions from raw children
    import org.apache.spark.sql.catalyst.expressions.Literal
    val byName = GraftFunctions.builders.map(b => b._1.funcName -> b._3).toMap
    assert(byName.keySet == Set(
      "fingerprint64", "simhash64", "minhash_signature", "minhash_text",
      "simhash_text", "minhash_fp", "simhash_fp", "image_dims", "wav_meta",
      "mp4_meta", "mp4_mdat_sig", "mp3_frames_sig", "mp3_meta",
      "flac_stream_sig", "flac_meta", "ogg_packets_sig", "ogg_meta",
      "script_profile",
      "tokenize_ws", "token_count_ws", "distinct_token_count_ws",
      "distinct_ngram_count_ws", "sum_token_chars_ws", "count_substr",
      "extract_html_text", "token_window_fps", "image_phash", "image_dhash",
      "audio_envelope_hash", "video_frame_phashes", "interleave_bits",
      "interleave_bits_k", "warc_records", "http_response"))
    assert(byName("fingerprint64")(Seq(Literal("x"))).isInstanceOf[Fingerprint64])
    val mh = byName("minhash_text")(Seq(Literal("x"), Literal(5), Literal(64)))
    assert(mh == MinHashText(Literal("x"), 5, 64))
    intercept[IllegalArgumentException](
      byName("minhash_signature")(Seq(Literal("x"), Literal("not-an-int"))))
  }

  test("simhash: near-duplicate token sets land within small Hamming distance") {
    val base = (1 to 200).map(i => s"w$i")
    val nearDup = base.updated(5, "CHANGED").updated(100, "ALSO")
    val far = (1 to 200).map(i => s"v$i")
    def sig(tokens: Seq[String]): Long =
      GraftHash.simhash64(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(base), sig(nearDup)) < 12)
    assert(hamming(sig(base), sig(far)) > 12)
  }

  test("minhash_text kernel: byte-window reference equality, short-text degrade") {
    def ref(s: String, shingle: Int, k: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8")
      val windows =
        if (bytes.length <= shingle) Seq(bytes.take(math.min(shingle, bytes.length)))
        else bytes.sliding(shingle).toSeq
      (0 until k).map { lane =>
        windows.map { w =>
          val h0 = w.foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xff)) * 0x100000001b3L)
          var z = h0 + lane * 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }.min
      }
    }
    for (s <- Seq("hello world, this is a longer text", "ab", "abcde", "x")) {
      val got = GraftHash.minhashTextSignature(UTF8String.fromString(s), 5, 16)
      assert((0 until 16).map(got.getLong) == ref(s, 5, 16), s"text '$s'")
    }
    // identical texts share full signatures; disjoint texts share ~none
    val a = GraftHash.minhashTextSignature(UTF8String.fromString("a" * 500), 5, 64)
    val b = GraftHash.minhashTextSignature(UTF8String.fromString("b" * 500), 5, 64)
    assert((0 until 64).count(i => a.getLong(i) == b.getLong(i)) == 0)
  }

  test("minhash_fp kernel: rolling-window reference equality, short-text degrade") {
    // naive reference: re-fold each window from scratch (the kernel rolls)
    def fp31(bs: Seq[Byte]): Long =
      bs.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % GraftHash.FpMod)
    def ref(s: String, shingle: Int, k: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8").toSeq
      val windows =
        if (bytes.length <= shingle) Seq(bytes)
        else bytes.sliding(shingle).toSeq
      // quadratic premix (h² + h) % p before the affine lanes — the
      // kernel's min-wise-bias breaker
      val gs = windows.map { w => val h = fp31(w); (h * h + h) % GraftHash.FpMod }
      (0 until k).map { lane =>
        gs.map { g =>
          (GraftHash.LaneA(lane) * g + GraftHash.LaneB(lane)) % GraftHash.FpMod
        }.min
      }
    }
    for (s <- Seq("hello world, this is a longer text", "ab", "abcde", "x", "",
        "héllo wörld ünïcode", "漢字テスト")) {
      val got = GraftHash.minhashFpSignature(UTF8String.fromString(s), 5, 16)
      assert((0 until 16).map(got.getLong) == ref(s, 5, 16), s"text '$s'")
    }
    // identical texts share full signatures; disjoint texts share ~none
    val a = GraftHash.minhashFpSignature(UTF8String.fromString("a" * 500), 5, 64)
    val b = GraftHash.minhashFpSignature(UTF8String.fromString("b" * 500), 5, 64)
    assert((0 until 64).count(i => a.getLong(i) == b.getLong(i)) == 0)
    // every lane value stays inside [0, FpMod) — the oracle's BIGINT range
    assert((0 until 64).forall(i => a.getLong(i) >= 0 && a.getLong(i) < GraftHash.FpMod))
  }

  test("shingle_fp_set: sorted distinct premixed windows; lane mins re-derive") {
    def fp31(bs: Seq[Byte]): Long =
      bs.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % GraftHash.FpMod)
    def refSet(s: String, shingle: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8").toSeq
      val windows =
        if (bytes.length <= shingle) Seq(bytes)
        else bytes.sliding(shingle).toSeq
      windows.map { w => val h = fp31(w); (h * h + h) % GraftHash.FpMod }
        .distinct.sorted
    }
    for (s <- Seq("hello world, this is a longer text", "ab", "abcde", "x", "",
        "aaaaaaaaaa", "héllo wörld ünïcode")) {
      val got = GraftHash.shingleFpSet(UTF8String.fromString(s), 5)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      assert(gotSeq == refSet(s, 5), s"text '$s'")
      assert(gotSeq == gotSeq.distinct.sorted, "sorted distinct invariant")
    }
    // the signature is EXACTLY the per-lane affine min over this set:
    // estimate-then-verify measures one universe
    val text = "the quick brown fox jumps over the lazy dog, twice over"
    val set = GraftHash.shingleFpSet(UTF8String.fromString(text), 5)
    val setSeq = (0 until set.numElements()).map(set.getLong)
    val sig = GraftHash.minhashFpSignature(UTF8String.fromString(text), 5, 16)
    (0 until 16).foreach { lane =>
      val want = setSeq.map(g =>
        (GraftHash.LaneA(lane) * g + GraftHash.LaneB(lane)) % GraftHash.FpMod).min
      assert(sig.getLong(lane) == want, s"lane $lane")
    }
    // empty text: one whole-payload window, fingerprint 0, premix 0
    val empty = GraftHash.shingleFpSet(UTF8String.fromString(""), 5)
    assert(empty.numElements() == 1 && empty.getLong(0) == 0L)
  }

  test("simhash_fp: 60-bit portable hash, near-dup Hamming locality") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def sig(tokens: Seq[String]): Long =
      GraftHash.simhashFp(ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray))
    // reference: combined 60-bit hash per token, majority vote
    def ref(tokens: Seq[String]): Long = {
      val votes = new Array[Int](60)
      tokens.foreach { t =>
        val u = UTF8String.fromString(t)
        val h = GraftHash.fingerprint64(u) | (GraftHash.fingerprint37(u) << 30)
        (0 until 60).foreach(j => votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1))
      }
      (0 until 60).foldLeft(0L)((acc, j) => if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val base = (1 to 200).map(i => s"w$i")
    assert(sig(base) == ref(base))
    assert(sig(Seq.empty) == 0L)
    assert(sig(Seq("")) == 0L) // empty token hashes to 0 → all bits vote down
    // signatures fit 60 bits (BIGINT-safe for the SQL oracle)
    assert(sig(base) >= 0 && sig(base) < (1L << 60))
    def hamming(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val nearDup = base.updated(5, "CHANGED").updated(100, "ALSO")
    val far = (1 to 200).map(i => s"v$i")
    assert(hamming(sig(base), sig(nearDup)) < 12)
    assert(hamming(sig(base), sig(far)) > 12)
  }

  test("simhash_text agrees with simhash64 over split tokens") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (s <- Seq("the quick  brown\tfox", " leading and trailing ", "single", "",
        "a\nb\rc", "x" * 100 + " " + "y" * 50)) {
      val viaTokens = GraftHash.simhash64(ArrayData.toArrayData(
        s.trim.split("\\s+").filter(_.nonEmpty).map(UTF8String.fromString)))
      val direct = GraftHash.simhashText(UTF8String.fromString(s))
      assert(direct == viaTokens, s"text '$s'")
    }
  }

  test("minhash signature estimates Jaccard") {
    val a = (1 to 1000).map(i => s"sh$i")
    val b = (1 to 1000).map(i => if (i <= 800) s"sh$i" else s"zz$i") // J = 800/1200
    def sig(xs: Seq[String]) = {
      val arr = GraftHash.minhashSignature(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          xs.map(UTF8String.fromString).toArray), 128)
      (0 until 128).map(arr.getLong)
    }
    val (sa, sb) = (sig(a), sig(b))
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    val trueJ = 800.0 / 1200.0
    assert(math.abs(est - trueJ) < 0.12, s"est=$est true=$trueJ")
  }
}

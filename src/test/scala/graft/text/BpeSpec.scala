package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** BPE trainer pinned against a transparent local reference implementation
  * (word-count map + pair counting + left-to-right merge), plus the
  * determinism and encode invariants that matter for a tokenizer build.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  // ---- local reference BPE (the executable specification) -------------
  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("\\s+", -1).toSeq.filter(_.nonEmpty)

  private def refTrain(corpus: Seq[String], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus.flatMap(refTokens)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.size < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + cnt
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          out += ((l, r, c))
          words = words.map { case (syms, cnt) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toVector -> cnt
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        case _ => continue = false
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "the newest gadget is the widest gadget",
    "low lower lowest")

  test("trainer matches the local reference merge-for-merge") {
    import spark.implicits._
    val df = corpus.toDF("text")
    val got = Bpe.train(df, "text", numMerges = 12)
      .map(m => (m.left, m.right, m.pairCount))
    val want = refTrain(corpus, numMerges = 12)
    assert(got == want)
  }

  test("distributed path (threshold 0) == driver-local fast path") {
    import spark.implicits._
    val df = corpus.toDF("text")
    val local = Bpe.train(df, "text", numMerges = 12)
    val distributed = Bpe.train(df, "text", numMerges = 12,
      localVocabThreshold = 0L)
    assert(distributed == local)
    assert(local.map(m => (m.left, m.right, m.pairCount)) ==
      refTrain(corpus, numMerges = 12))
  }

  test("training is deterministic across partitionings") {
    import spark.implicits._
    val a = Bpe.train(corpus.toDF("text").repartition(1), "text", 8)
    val b = Bpe.train(corpus.toDF("text").repartition(7), "text", 8)
    assert(a == b)
  }

  test("merge ranks are 1..n and counts are non-increasing only when pairs disjoint — counts are positive and >= minPairCount") {
    import spark.implicits._
    val ms = Bpe.train(corpus.toDF("text"), "text", 10, minPairCount = 2L)
    assert(ms.map(_.rank) == (1 to ms.size))
    assert(ms.forall(_.pairCount >= 2L))
  }

  test("encode: concatenated subwords rebuild each word; fertility >= 1") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", 10)
    val pairs = merges.map(m => (m.left, m.right))
    // kernel-level invariant: joining the subwords restores the word
    val words = corpus.flatMap(refTokens).distinct
    words.foreach { w =>
      val ad = graft.functions.TextKernels.bpeEncodeWord(
        org.apache.spark.unsafe.types.UTF8String.fromString(w),
        pairs.flatMap(p => Seq(p._1, p._2))
          .map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      val subs = (0 until ad.numElements()).map(ad.getUTF8String(_).toString)
      assert(subs.mkString == w, s"word $w")
      assert(subs.nonEmpty)
    }
    val enc = Bpe.encode(df, "doc_id", "text", merges).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nSub = r.getAs[Long]("n_subwords")
      assert(nSub >= nTok) // a word is at least one subword
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
  }

  test("merge kernel: non-overlapping left-to-right discipline") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.ArrayData
    val arr = ArrayData.toArrayData(
      Array("a", "a", "a").map(UTF8String.fromString))
    val out = graft.functions.TextKernels.bpeMergePair(arr,
      UTF8String.fromString("a"), UTF8String.fromString("a"))
    assert((0 until out.numElements()).map(out.getUTF8String(_).toString)
      == Seq("aa", "a"))
  }

  test("byte-level: hex symbol init, multi-byte fallback encode, and path equality") {
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    // splitBytesHex is the UTF-8 byte sequence as uppercase hex pairs
    def hx(w: String): Seq[String] = {
      val out = graft.functions.TextKernels.splitBytesHex(UTF8String.fromString(w))
      (0 until out.numElements()).map(out.getUTF8String(_).toString)
    }
    assert(hx("é") == Seq("C3", "A9"))
    assert(hx("ab") == Seq("61", "62"))
    assert(hx("中") == Seq("E4", "B8", "AD"))
    assert(hx("") == Seq())
    // fixedByteMerges encode: chained ASCII and lead+continuation UTF-8
    val flat = Bpe.fixedByteMerges.flatMap(m => Seq(m.left, m.right))
      .map(UTF8String.fromString).toArray
    def enc(w: String): Seq[String] = {
      val out = graft.functions.TextKernels.bpeEncodeWordBytes(
        UTF8String.fromString(w), flat)
      (0 until out.numElements()).map(out.getUTF8String(_).toString)
    }
    assert(enc("the") == Seq("746865"))
    assert(enc("café") == Seq("63", "61", "66", "C3A9"))
    assert(enc("€") == Seq("E282AC"))
    assert(enc("中文") == Seq("E4B8AD", "E69687"))
    assert(enc("żółć") == Seq("C5BC", "C3B3", "C582", "C487"))
    // an UNMERGED multi-byte char costs its byte count — the fallback
    // ceiling, never an OOV
    assert(enc("ß") == Seq("C3", "9F"))
    // byte-level training: distributed path == driver-local fast path
    // on a corpus with multi-byte words (the char-path equality pin,
    // re-run under byteLevel)
    val df = (corpus ++ Seq("café café café żółć żółć the the")).toDF("text")
    val local = Bpe.train(df, "text", numMerges = 12, byteLevel = true)
    val dist = Bpe.train(df, "text", numMerges = 12,
      localVocabThreshold = 0L, byteLevel = true)
    assert(local == dist, s"byte-level paths diverged:\n$local\n$dist")
    // every merged symbol is even-length hex (byte-run closed)
    local.foreach { m =>
      assert((m.left + m.right).matches("[0-9A-F]+")
        && (m.left.length + m.right.length) % 2 == 0)
    }
    // encodeBytes: n_bytes is the fallback ceiling, counts add up
    val got = Bpe.encodeBytes(
      Seq((1L, "the café 中文")).toDF("doc_id", "text"),
      "doc_id", "text", Bpe.fixedByteMerges)
      .select("n_tokens", "n_subwords", "n_bytes")
      .as[(Long, Long, Long)].head()
    // the→1, café→4 (c,a,f,é), 中文→2; bytes 3+5+6
    assert(got == ((3L, 7L, 14L)))
  }

  test("fixedMerges: rank-chained merges compose (ti+on -> tion) and ranks are dense") {
    import org.apache.spark.unsafe.types.UTF8String
    val m = Bpe.fixedMerges
    assert(m.map(_.rank) == m.indices)
    // every multi-char side is produced by an earlier-rank merge
    val producible = m.scanLeft(('a' to 'z').map(_.toString).toSet) {
      (known, mg) => known + (mg.left + mg.right)
    }
    m.zip(producible).foreach { case (mg, known) =>
      assert(known.contains(mg.left) && known.contains(mg.right),
        s"merge ${mg.rank} (${mg.left},${mg.right}) references an unproducible symbol")
    }
    val flat = m.flatMap(mm => Seq(mm.left, mm.right))
      .map(UTF8String.fromString).toArray
    def enc(w: String): Seq[String] = {
      val out = graft.functions.TextKernels.bpeEncodeWord(
        UTF8String.fromString(w), flat)
      (0 until out.numElements()).map(out.getUTF8String(_).toString)
    }
    assert(enc("the") == Seq("the"))      // t+h then th+e
    assert(enc("and") == Seq("and")) // a+n (rank 3) then an+d (rank 4)
    assert(enc("motion") == Seq("m", "o", "tion")) // o+n, t+i, ti+on chain
    assert(enc("x") == Seq("x"))
  }
}

package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Distributed byte-pair-encoding trainer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-construction step of an LLM data pipeline.
  *
  * The classic observation that makes BPE tractable at corpus scale: the
  * merge loop never touches the corpus — it runs over the WORD-COUNT
  * table (distinct words × frequencies), which is orders of magnitude
  * smaller (Heaps' law) and shrinks further per merge. Shape per
  * iteration:
  *
  *  1. adjacent-pair explode over the symbol arrays — a pure scan of the
  *     vocab table (|vocab| rows, not |corpus|);
  *  2. `groupBy(pair).agg(sum(word_count))` — ONE small shuffle with
  *     map-side combine; distinct-pair cardinality is bounded by total
  *     symbol occurrences;
  *  3. argmax pair to the driver — a 1-row collect (like the k-means
  *     update step, this is an aggregated scalar, not data);
  *  4. merge applied to every word via a codegen'd kernel
  *     ([[graft.functions.BpeMergePair]]), left-to-right non-overlapping.
  *
  * The vocab table is cached and re-checkpointed every
  * `checkpointEvery` merges so the plan stays shallow across iterations
  * (k merges would otherwise stack k kernel applications of lineage).
  *
  * Determinism: ties on pair count break by (left, right) lexicographic —
  * same corpus, same merge sequence, any partitioning.
  */
object Bpe {

  /** One learned merge: rank order, the pair, and its count at selection
    * time. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** A pinned 30-merge English tokenizer. Data-independent, so an encode
    * over it is a pure deterministic function of the text — which makes
    * the full greedy encode expressible as portable SQL (a rank-ordered
    * replace chain) and gives the `bpe_encode_fixed` query a real oracle;
    * the trained path keeps its merge-for-merge BpeSpec pin. Chained
    * merges (`th+e`, `an+d`, `in+g`, `ti+on`) depend on earlier ranks,
    * exercising the fold order. */
  val fixedMerges: Seq[Merge] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("t", "i"), ("s", "t"), ("a", "r"),
    ("a", "l"), ("o", "u"), ("i", "t"), ("i", "s"), ("e", "d"),
    ("in", "g"), ("ti", "on"), ("o", "f"), ("t", "o"), ("l", "e"),
    ("m", "e"), ("c", "h"), ("s", "e"), ("c", "o"), ("d", "e")
  ).zipWithIndex.map { case ((l, r), i) => Merge(i, l, r, 0L) }

  /** A pinned BYTE-LEVEL merge list (GPT-2-style byte fallback): symbols
    * are uppercase hex byte pairs ([[graft.functions.TextKernels
    * .splitBytesHex]]), so a merged symbol is the hex of its merged byte
    * run and the encode is statable over `hex(encode(word))` in portable
    * SQL. The list deliberately mixes the English-frequency merges of
    * [[fixedMerges]] (as bytes — chained `74 68`→`7468`→`746865` =
    * "the") with multi-byte UTF-8 completions: two-byte Latin-ext
    * (é ü ó ż ł ć), and chained three-byte sequences (€, 中, 文) whose
    * lead+continuation merges are exactly how byte-level vocabularies
    * learn non-Latin characters. Data-independent → full greedy-encode
    * oracle, like `bpe_encode_fixed`. */
  val fixedByteMerges: Seq[Merge] = Seq(
    // English pair/chain merges (hex of t,h / th,e / i,n / a,n / an,d /
    // e,r / o,n / r,e / a,t / e,n / o,r / e,s)
    ("74", "68"), ("7468", "65"), ("69", "6E"), ("61", "6E"), ("616E", "64"),
    ("65", "72"), ("6F", "6E"), ("72", "65"), ("61", "74"), ("65", "6E"),
    ("6F", "72"), ("65", "73"),
    // two-byte UTF-8 characters: é ü ó ż ł ć
    ("C3", "A9"), ("C3", "BC"), ("C3", "B3"),
    ("C5", "BC"), ("C5", "82"), ("C4", "87"),
    // three-byte UTF-8, lead+continuation chains: € 中 文
    ("E2", "82"), ("E282", "AC"),
    ("E4", "B8"), ("E4B8", "AD"),
    ("E6", "96"), ("E696", "87")
  ).zipWithIndex.map { case ((l, r), i) => Merge(i, l, r, 0L) }

  /** Word-frequency table with initial symbol arrays: (word, cnt, syms).
    * Lowercased, whitespace-tokenized; symbols are code points, or UTF-8
    * hex byte pairs when `byteLevel`. */
  def wordTable(df: DataFrame, textCol: String,
      byteLevel: Boolean = false): DataFrame =
    df.select(explode(TextOps.tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        if (byteLevel) GraftFunctions.splitBytesHex(col("word"))
        else GraftFunctions.splitChars(col("word")))

  /** Learn `numMerges` merges; stop early when the best pair's count
    * drops below `minPairCount`.
    *
    * Two execution paths with IDENTICAL results (equality pinned in
    * BpeSpec):
    *  - vocab ≤ `localVocabThreshold`: the aggregated (word, cnt) table
    *    collects to the driver ONCE and the merge loop runs locally —
    *    k merges cost one distributed aggregation instead of k scheduled
    *    jobs whose fixed overhead dominates at small vocab.
    *  - larger vocabs (the 100 TB corpus: 10–100 M distinct words): the
    *    distributed loop — per merge one vocab-table scan + one small
    *    shuffle, only the argmax row reaching the driver.
    */
  def train(
      df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, checkpointEvery: Int = 8,
      localVocabThreshold: Long = 200000L,
      byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    var words = wordTable(df, textCol, byteLevel).cache()
    val vocabSize = words.count() // materialize before the loop

    if (vocabSize <= localVocabThreshold) {
      val localWords = words.select(col("word"), col("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      words.unpersist()
      return trainLocal(localWords, numMerges, minPairCount, byteLevel)
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairs = words.select(col("cnt"), explode(
          when(size(col("syms")) < 2,
            array().cast("array<struct<l:string,r:string>>"))
            .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(
                element_at(col("syms"), i + 1).as("l"),
                element_at(col("syms"), i + 2).as("r"))))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()

      if (pairs.isEmpty || pairs.head.getLong(2) < minPairCount) done = true
      else {
        val (l, r, c) = (pairs.head.getString(0), pairs.head.getString(1),
          pairs.head.getLong(2))
        merges += Merge(rank, l, r, c)
        val prev = words
        val next = prev.withColumn("syms",
          GraftFunctions.bpeMergePair(col("syms"), l, r))
        words = (if (rank % checkpointEvery == 0) graft.ops.Checkpoints.pin(next)
                 else next).cache()
        words.count() // materialize before dropping the parent's cache
        prev.unpersist()
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** The driver-local merge loop — same algorithm, plain collections.
    * Symbol init is the same code-point split as the distributed kernel
    * ([[graft.functions.TextKernels.splitChars]]), tie-break identical:
    * (count desc, left asc, right asc). */
  private def trainLocal(
      wordCounts: Array[(String, Long)], numMerges: Int,
      minPairCount: Long, byteLevel: Boolean = false): Seq[Merge] = {
    val hexDigits = "0123456789ABCDEF"
    var words: Map[Vector[String], Long] = wordCounts.groupBy { case (w, _) =>
      if (byteLevel) {
        // same init as TextKernels.splitBytesHex: UTF-8 hex byte pairs
        w.getBytes(java.nio.charset.StandardCharsets.UTF_8).toVector.map { b =>
          new String(Array(hexDigits((b & 0xff) >>> 4), hexDigits(b & 0xf)))
        }
      } else {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          val n = Character.charCount(cp)
          out += w.substring(i, i + n)
          i += n
        }
        out.result()
      }
    }.map { case (syms, ws) => syms -> ws.map(_._2).sum }

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.size) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + cnt
          i += 1
        }
      }
      // tie-break in UTF-8 BYTE order (UTF8String.compareTo) — Spark's
      // string ordering, which the distributed path's orderBy uses. Scala
      // String '<' compares UTF-16 code units, which disagrees beyond the
      // BMP (supplementary chars sort before U+E000.. in UTF-16 but after
      // in UTF-8), and the two paths must pick IDENTICAL merges.
      def u8Less(a: String, b: String): Boolean =
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, entry @ ((l, r), c)) =>
          acc match {
            case Some(((bl, br), bc)) =>
              if (c > bc || (c == bc &&
                (u8Less(l, bl) || (l == bl && u8Less(r, br))))) Some(entry)
              else acc
            case None => Some(entry)
          }
      }
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          merges += Merge(rank, l, r, c)
          words = words.toSeq.map { case (syms, cnt) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> cnt
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          rank += 1
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** Merge table as a DataFrame (rank, left, right, pair_count) — the
    * declared-query surface. */
  def trainDf(
      spark: SparkSession, df: DataFrame, textCol: String,
      numMerges: Int, minPairCount: Long = 2L,
      byteLevel: Boolean = false): DataFrame = {
    import spark.implicits._
    train(df, textCol, numMerges, minPairCount, byteLevel = byteLevel)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Encode documents with a trained merge list: each token becomes its
    * subword sequence; returns (idCol, n_tokens, n_subwords, fertility).
    * Pure scan — merges inline into the codegen'd kernel, no join. */
  def encode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val subs = df.select(col(idCol),
      explode(TextOps.tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("n_subwords",
        size(GraftFunctions.bpeEncodeWord(col("word"), pairs)))
    subs.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_subwords").cast("long")).as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_tokens"), 6))
  }

  /** BYTE-LEVEL encode (GPT-2-style byte fallback): like [[encode]] but
    * words split to UTF-8 byte symbols before the merge fold — so a
    * vocabulary trained byte-level (or the pinned [[fixedByteMerges]])
    * counts tokens the way production byte-level tokenizers do on
    * non-ASCII text: an unmerged multi-byte character costs its BYTE
    * count, never an out-of-vocabulary token. Adds `n_bytes` (the
    * pre-merge symbol count — the fallback ceiling on n_subwords) to
    * the per-doc output. Pure scan, merges inlined into the codegen'd
    * kernel, no join. */
  def encodeBytes(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val subs = df.select(col(idCol),
      explode(TextOps.tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("n_subwords",
        size(GraftFunctions.bpeEncodeWordBytes(col("word"), pairs)))
      .withColumn("n_bytes", octet_length(col("word")))
    subs.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_subwords").cast("long")).as("n_subwords"),
        sum(col("n_bytes").cast("long")).as("n_bytes"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_tokens"), 6))
  }
}

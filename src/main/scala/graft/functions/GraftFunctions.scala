package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration + Column-API surface for the custom Catalyst expressions.
  *
  * Two entry points:
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)` (used by Verify/Bench and
  *    tests), which installs the same builders into the session's
  *    FunctionRegistry.
  *
  * Either way the functions are usable from SQL text and, via the helpers
  * below, the Column API — all without leaving whole-stage codegen.
  */
object GraftFunctions {

  private def kOf(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"minhash_signature(shingles, k): k must be an int literal, got $other")
  }

  val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (exprs: Seq[Expression]) => Fingerprint64(exprs.head)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head, kOf(exprs(1)))),
    (FunctionIdentifier("minhash_text"),
      new ExpressionInfo(classOf[MinHashText].getName, "minhash_text"),
      (exprs: Seq[Expression]) => MinHashText(exprs.head, kOf(exprs(1)), kOf(exprs(2)))),
    (FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName, "simhash_text"),
      (exprs: Seq[Expression]) => SimHashText(exprs.head)),
    (FunctionIdentifier("minhash_fp"),
      new ExpressionInfo(classOf[MinHashFp].getName, "minhash_fp"),
      (exprs: Seq[Expression]) => MinHashFp(exprs.head, kOf(exprs(1)), kOf(exprs(2)))),
    (FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
      (exprs: Seq[Expression]) => SimHashFp(exprs.head)),
    (FunctionIdentifier("image_dims"),
      new ExpressionInfo(classOf[ImageDims].getName, "image_dims"),
      (exprs: Seq[Expression]) => ImageDims(exprs.head)),
    (FunctionIdentifier("wav_meta"),
      new ExpressionInfo(classOf[WavMeta].getName, "wav_meta"),
      (exprs: Seq[Expression]) => WavMeta(exprs.head)),
    (FunctionIdentifier("mp4_meta"),
      new ExpressionInfo(classOf[Mp4Meta].getName, "mp4_meta"),
      (exprs: Seq[Expression]) => Mp4Meta(exprs.head)),
    (FunctionIdentifier("mp4_mdat_sig"),
      new ExpressionInfo(classOf[Mp4MdatSig].getName, "mp4_mdat_sig"),
      (exprs: Seq[Expression]) => Mp4MdatSig(exprs.head)),
    (FunctionIdentifier("mp3_frames_sig"),
      new ExpressionInfo(classOf[Mp3FramesSig].getName, "mp3_frames_sig"),
      (exprs: Seq[Expression]) => Mp3FramesSig(exprs.head)),
    (FunctionIdentifier("mp3_meta"),
      new ExpressionInfo(classOf[Mp3MetaExpr].getName, "mp3_meta"),
      (exprs: Seq[Expression]) => Mp3MetaExpr(exprs.head)),
    (FunctionIdentifier("flac_stream_sig"),
      new ExpressionInfo(classOf[FlacStreamSig].getName, "flac_stream_sig"),
      (exprs: Seq[Expression]) => FlacStreamSig(exprs.head)),
    (FunctionIdentifier("flac_meta"),
      new ExpressionInfo(classOf[FlacMetaExpr].getName, "flac_meta"),
      (exprs: Seq[Expression]) => FlacMetaExpr(exprs.head)),
    (FunctionIdentifier("ogg_packets_sig"),
      new ExpressionInfo(classOf[OggPacketsSig].getName, "ogg_packets_sig"),
      (exprs: Seq[Expression]) => OggPacketsSig(exprs.head)),
    (FunctionIdentifier("ogg_meta"),
      new ExpressionInfo(classOf[OggMetaExpr].getName, "ogg_meta"),
      (exprs: Seq[Expression]) => OggMetaExpr(exprs.head)),
    (FunctionIdentifier("script_profile"),
      new ExpressionInfo(classOf[ScriptProfile].getName, "script_profile"),
      (exprs: Seq[Expression]) => ScriptProfile(exprs.head)),
    (FunctionIdentifier("tokenize_ws"),
      new ExpressionInfo(classOf[TokenizeWs].getName, "tokenize_ws"),
      (exprs: Seq[Expression]) => TokenizeWs(exprs.head)),
    (FunctionIdentifier("token_count_ws"),
      new ExpressionInfo(classOf[TokenCountWs].getName, "token_count_ws"),
      (exprs: Seq[Expression]) => TokenCountWs(exprs.head)),
    (FunctionIdentifier("distinct_token_count_ws"),
      new ExpressionInfo(classOf[DistinctTokenCountWs].getName, "distinct_token_count_ws"),
      (exprs: Seq[Expression]) => DistinctTokenCountWs(exprs.head)),
    (FunctionIdentifier("distinct_ngram_count_ws"),
      new ExpressionInfo(classOf[DistinctNgramCountWs].getName, "distinct_ngram_count_ws"),
      (exprs: Seq[Expression]) => DistinctNgramCountWs(exprs.head, kOf(exprs(1)))),
    (FunctionIdentifier("sum_token_chars_ws"),
      new ExpressionInfo(classOf[SumTokenCharsWs].getName, "sum_token_chars_ws"),
      (exprs: Seq[Expression]) => SumTokenCharsWs(exprs.head)),
    (FunctionIdentifier("count_substr"),
      new ExpressionInfo(classOf[CountSubstr].getName, "count_substr"),
      (exprs: Seq[Expression]) => CountSubstr(exprs.head, exprs(1))),
    (FunctionIdentifier("extract_html_text"),
      new ExpressionInfo(classOf[ExtractHtmlText].getName, "extract_html_text"),
      (exprs: Seq[Expression]) => ExtractHtmlText(exprs.head)),
    (FunctionIdentifier("token_window_fps"),
      new ExpressionInfo(classOf[TokenWindowFps].getName, "token_window_fps"),
      (exprs: Seq[Expression]) => TokenWindowFps(exprs.head, kOf(exprs(1)))),
    (FunctionIdentifier("image_phash"),
      new ExpressionInfo(classOf[ImagePHash].getName, "image_phash"),
      (exprs: Seq[Expression]) => ImagePHash(exprs.head)),
    (FunctionIdentifier("image_dhash"),
      new ExpressionInfo(classOf[ImageDHash].getName, "image_dhash"),
      (exprs: Seq[Expression]) => ImageDHash(exprs.head)),
    (FunctionIdentifier("audio_envelope_hash"),
      new ExpressionInfo(classOf[AudioEnvelopeHash].getName, "audio_envelope_hash"),
      (exprs: Seq[Expression]) => AudioEnvelopeHash(exprs.head)),
    (FunctionIdentifier("video_frame_phashes"),
      new ExpressionInfo(classOf[VideoFramePhashes].getName, "video_frame_phashes"),
      (exprs: Seq[Expression]) => VideoFramePhashes(exprs.head, kOf(exprs(1)))),
    (FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (exprs: Seq[Expression]) => InterleaveBits(exprs.head, exprs(1))),
    (FunctionIdentifier("interleave_bits_k"),
      new ExpressionInfo(classOf[InterleaveBitsK].getName, "interleave_bits_k"),
      (exprs: Seq[Expression]) => InterleaveBitsK(exprs)),
    (FunctionIdentifier("warc_records"),
      new ExpressionInfo(classOf[WarcRecordsExpr].getName, "warc_records"),
      (exprs: Seq[Expression]) => WarcRecordsExpr(exprs.head)),
    (FunctionIdentifier("http_response"),
      new ExpressionInfo(classOf[HttpResponseExpr].getName, "http_response"),
      (exprs: Seq[Expression]) => HttpResponseExpr(exprs.head))
  )

  /** Install into an existing session (idempotent) for SQL-text call
    * sites; the Column helpers below do not need this. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (ident, info, builder) =>
      registry.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
      val _ = info // ExpressionInfo used by the extensions path
    }
  }

  // Column-API helpers: build the Catalyst expression directly — no
  // registry lookup, no SQL text, usable in any session.
  import org.apache.spark.sql.GraftColumnShim.{column, expression}
  def fingerprint64(c: Column): Column = column(Fingerprint64(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def minhashSignature(c: Column, k: Int): Column =
    column(MinHashSignature(expression(c), k))
  def minhashText(c: Column, shingleSize: Int, k: Int): Column =
    column(MinHashText(expression(c), shingleSize, k))
  def simhashText(c: Column): Column = column(SimHashText(expression(c)))
  def minhashFp(c: Column, shingleSize: Int, k: Int): Column =
    column(MinHashFp(expression(c), shingleSize, k))
  def simhashFp(c: Column): Column = column(SimHashFp(expression(c)))
  def shingleFpSet(c: Column, shingleSize: Int): Column =
    column(ShingleFpSet(expression(c), shingleSize))
  def tokenWindowFps(c: Column, w: Int): Column =
    column(TokenWindowFps(expression(c), w))
  def normalizeNfc(c: Column): Column = column(NormalizeNfc(expression(c)))
  def imageDims(c: Column): Column = column(ImageDims(expression(c)))
  def wavMeta(c: Column): Column = column(WavMeta(expression(c)))
  def mp4Meta(c: Column): Column = column(Mp4Meta(expression(c)))
  def tokenizeWs(c: Column): Column = column(TokenizeWs(expression(c)))
  def tokenCountWs(c: Column): Column = column(TokenCountWs(expression(c)))
  def distinctTokenCountWs(c: Column): Column = column(DistinctTokenCountWs(expression(c)))
  def distinctNgramCountWs(c: Column, n: Int): Column =
    column(DistinctNgramCountWs(expression(c), n))
  def sumTokenCharsWs(c: Column): Column = column(SumTokenCharsWs(expression(c)))
  def countSubstr(hay: Column, needle: Column): Column =
    column(CountSubstr(expression(hay), expression(needle)))
  def countAsciiClass(c: Column, chars: String): Column =
    column(CountAsciiClass(expression(c), chars))
  def splitChars(c: Column): Column = column(SplitChars(expression(c)))
  def wordNgrams(c: Column, n: Int, distinct: Boolean): Column =
    column(WordNgrams(expression(c), n, distinct))
  def normWordNgrams(c: Column, n: Int, distinct: Boolean): Column =
    column(NormWordNgrams(expression(c), n, distinct))
  def uniWordNgrams(c: Column, n: Int, distinct: Boolean): Column =
    column(UniWordNgrams(expression(c), n, distinct))
  def bpeMergePair(c: Column, left: String, right: String): Column =
    column(BpeMergePair(expression(c), left, right))
  def bpeEncodeWord(c: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeWord(expression(c), merges))
  def splitBytesHex(c: Column): Column = column(SplitBytesHex(expression(c)))
  def bpeEncodeWordBytes(c: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeWordBytes(expression(c), merges))
  def extractHtmlText(c: Column): Column = column(ExtractHtmlText(expression(c)))
  def imagePHash(c: Column): Column = column(ImagePHash(expression(c)))
  def imageDHash(c: Column): Column = column(ImageDHash(expression(c)))
  def audioEnvelopeHash(c: Column): Column = column(AudioEnvelopeHash(expression(c)))
  def interleaveBitsK(cols: Seq[Column]): Column =
    column(InterleaveBitsK(cols.map(expression)))
  def bucketByBounds(v: Column, bounds: Array[Double]): Column =
    column(BucketByBounds(expression(v), bounds.toSeq))
  def interleaveBits(a: Column, b: Column): Column =
    column(InterleaveBits(expression(a), expression(b)))
  def videoFramePhashes(c: Column, n: Int): Column =
    column(VideoFramePhashes(expression(c), n))
  def syntheticPng(seed: Column, variant: Column): Column =
    column(SyntheticPng(expression(seed), expression(variant)))
  def syntheticWav(seed: Column, variant: Column): Column =
    column(SyntheticWav(expression(seed), expression(variant)))
  def syntheticAvi(seed: Column, variant: Column): Column =
    column(SyntheticAvi(expression(seed), expression(variant)))
  def mp4MdatSig(c: Column): Column = column(Mp4MdatSig(expression(c)))
  def syntheticMp4(seed: Column, variant: Column): Column =
    column(SyntheticMp4(expression(seed), expression(variant)))
  def mp3FramesSig(c: Column): Column = column(Mp3FramesSig(expression(c)))
  def unigramSegment(c: Column, pieces: Seq[String], logps: Seq[Double]): Column =
    column(UnigramSegment(expression(c), pieces, logps))
  def flacStreamSig(c: Column): Column = column(FlacStreamSig(expression(c)))
  def flacMeta(c: Column): Column = column(FlacMetaExpr(expression(c)))
  def syntheticFlac(seed: Column, variant: Column): Column =
    column(SyntheticFlac(expression(seed), expression(variant)))
  def oggPacketsSig(c: Column): Column = column(OggPacketsSig(expression(c)))
  def oggMeta(c: Column): Column = column(OggMetaExpr(expression(c)))
  def syntheticOgg(seed: Column, variant: Column): Column =
    column(SyntheticOgg(expression(seed), expression(variant)))
  def scriptProfile(c: Column): Column = column(ScriptProfile(expression(c)))
  def mp3Meta(c: Column): Column = column(Mp3MetaExpr(expression(c)))
  def syntheticMp3(seed: Column, variant: Column): Column =
    column(SyntheticMp3(expression(seed), expression(variant)))
  def warcRecords(c: Column): Column = column(WarcRecordsExpr(expression(c)))
  def httpResponse(c: Column): Column = column(HttpResponseExpr(expression(c)))
  def syntheticWarc(seed: Column, variant: Column, body: Column): Column =
    column(SyntheticWarc(expression(seed), expression(variant), expression(body)))
}

/** `spark.sql.extensions` entry point: SQL functions + the optimizer
  * rule that rewrites regex whitespace tokenization to the byte-scan
  * kernels ([[graft.plans.TokenizerRewrite]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.TokenizerRewrite)
  }
}

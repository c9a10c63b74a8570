package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.{PropCheck, SparkTestBase}

/** The tokenizer kernels replace `split(trim(text), "\\s+")`-based column
  * formulations that every text oracle was written against — so the ONLY
  * acceptable behavior is bit-identical parity. These properties compare
  * each kernel against the original regex/HOF formulation over adversarial
  * strings (whitespace runs, leading tabs, multi-byte, empties).
  */
class TextExprsSpec extends AnyFunSuite with SparkTestBase {

  // generator biased toward whitespace edge cases and multi-byte chars
  private val piece: Gen[String] = Gen.oneOf(
    Gen.oneOf(" ", "\t", "\n", "\r", "", "", "  ", " \t "),
    Gen.oneOf("a", "ab", "the", "föö", "日本語", "x1", ".", ",!", "a-b", " "),
    Gen.alphaNumStr.map(_.take(8)))
  private val textGen: Gen[String] =
    Gen.listOf(piece).map(_.mkString).flatMap(s =>
      Gen.oneOf(s, " " + s, s + " ", "\t" + s, s + "\t"))

  /** Java-side reference: the exact old column semantics. */
  private def refTokens(s: String): Seq[String] = {
    val t = {
      var a = 0; var b = s.length
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      s.substring(a, b)
    }
    // Spark's split(str, regex) = Java split with limit -1 (keeps trailing
    // empty tokens) — the kernels must reproduce that exactly
    if (t.isEmpty) Seq.empty else t.split("\\s+", -1).toSeq
  }

  test("tokenizeWs kernel == split(trim, \\s+) semantics (property)") {
    PropCheck.check(Prop.forAll(textGen) { s =>
      val ad = TextKernels.tokenizeWs(UTF8String.fromString(s))
      val got = (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      got == refTokens(s)
    })
  }

  test("counting kernels agree with the token list (property)") {
    PropCheck.check(Prop.forAll(textGen) { s =>
      val u = UTF8String.fromString(s)
      val toks = refTokens(s)
      val gramsOk = Seq(2, 3).forall { n =>
        val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        val expected = if (toks.size < n) 0 else grams.distinct.size
        TextKernels.distinctNgramCountWs(u, n) == expected
      }
      TextKernels.tokenCountWs(u) == toks.size &&
        TextKernels.distinctTokenCountWs(u) == toks.distinct.size &&
        // Spark's length() counts code points; mirror that on the JVM side
        TextKernels.sumTokenCharsWs(u) ==
          toks.map(t => t.codePointCount(0, t.length).toLong).sum &&
        gramsOk
    })
  }

  test("countSubstr == regexp length-delta trick (property)") {
    val needles = Gen.oneOf("ab", " the ", "日本", ".", "aa")
    PropCheck.check(Prop.forAll(textGen, needles) { (s, nd) =>
      var expected = 0L
      var i = 0
      while (i <= s.length - nd.length) {
        if (s.regionMatches(i, nd, 0, nd.length)) { expected += 1; i += nd.length }
        else i += 1
      }
      TextKernels.countSubstr(
        UTF8String.fromString(s), UTF8String.fromString(nd)) == expected
    })
  }

  test("wordNgrams kernel == wordShingles column formulation (property)") {
    PropCheck.check(Prop.forAll(textGen) { s =>
      val toks = refTokens(s)
      def kernel(distinct: Boolean): Seq[String] = {
        val ad = TextKernels.wordNgrams(UTF8String.fromString(s), 3, distinct)
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      }
      if (toks.size < 3) {
        // degrade contract: one element, the space-join of all tokens
        kernel(true) == Seq(toks.mkString(" ")) &&
          kernel(false) == Seq(toks.mkString(" "))
      } else {
        val all = toks.sliding(3).map(_.mkString(" ")).toSeq
        kernel(false) == all && kernel(true) == all.distinct
      }
    })
  }

  test("normWordNgrams kernel == lowercase/alnum-split model (property)") {
    // mixed-case + punctuation generator: the decontamination kernel's
    // adversarial surface is case flips and punctuation reflow
    val normPiece: Gen[String] = Gen.oneOf(
      Gen.oneOf(" ", "\t", ".", ",!", "--", "", "?!", "... "),
      Gen.oneOf("a", "Ab", "THE", "föö", "日本語", "x1", "Paris", "FrAnCe9"),
      Gen.alphaNumStr.map(_.take(8)))
    val normGen: Gen[String] = Gen.listOf(normPiece).map(_.mkString)
    PropCheck.check(Prop.forAll(normGen) { s =>
      // reference model: split on non-alnum runs, drop empties, ASCII-
      // lower each token (pure-ASCII tokens, so ROOT locale is exact)
      val toks = s.split("[^a-zA-Z0-9]+").toSeq.filter(_.nonEmpty)
        .map(_.toLowerCase(java.util.Locale.ROOT))
      def kernel(distinct: Boolean): Seq[String] = {
        val ad = TextKernels.normWordNgrams(UTF8String.fromString(s), 3, distinct)
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      }
      val degradeOk =
        kernel(true) == Seq(toks.mkString(" ")) &&
          kernel(false) == Seq(toks.mkString(" "))
      val fullOk = {
        val all = toks.sliding(3).map(_.mkString(" ")).toSeq
        kernel(false) == all && kernel(true) == all.distinct
      }
      if (toks.size < 3) degradeOk else fullOk
    })
  }

  test("normWordNgrams is invariant under case/punctuation mangling (property)") {
    PropCheck.check(Prop.forAll(Gen.listOf(Gen.oneOf(
      "the", "Quick", "BROWN", "fox9", " ")).map(_.mkString(" "))) { s =>
      val mangled = s.toUpperCase(java.util.Locale.ROOT)
        .replace(" ", ", ") + "!!"
      def grams(x: String): Seq[String] = {
        val ad = TextKernels.normWordNgrams(UTF8String.fromString(x), 3, true)
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      }
      grams(s) == grams(mangled)
    })
  }

  test("uniWordNgrams: tokenization pinned against the DuckDB restatement") {
    def toks(s: String): Seq[String] = {
      // n = 1 grams ARE the token sequence
      val ad = TextKernels.uniWordNgrams(UTF8String.fromString(s), 1, false)
      (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
    }
    // expectations are VERBATIM duckdb outputs of
    //   regexp_extract_all(regexp_replace(lower(s),
    //     '([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])', ' \1 ', 'g'),
    //     '[\p{L}\p{Nd}]+')
    assert(toks("The capital of France.") ==
      Seq("the", "capital", "of", "france"))
    assert(toks("人工智能，正在改变，世界的面貌。") ==
      Seq("人", "工", "智", "能", "正", "在", "改", "变", "世", "界", "的", "面", "貌"))
    assert(toks("БЫСТРАЯ, БУРАЯ ЛИСА!") == Seq("быстрая", "бурая", "лиса"))
    // the Katakana prolonged mark U+30FC is script=Common but \p{L}:
    // a run character on both sides, isolated here by its CJK neighbors
    assert(toks("東京タワーの高さは三百三十三メートル") ==
      Seq("東", "京", "タ", "ワ", "ー", "の", "高", "さ", "は", "三", "百",
        "三", "十", "三", "メ", "ー", "ト", "ル"))
    assert(toks("인공지능은세상의모습을빠르게바꾸고있다") ==
      Seq("인", "공", "지", "능", "은", "세", "상", "의", "모", "습", "을",
        "빠", "르", "게", "바", "꾸", "고", "있", "다"))
    assert(toks("mixed 中文 and English words") ==
      Seq("mixed", "中", "文", "and", "english", "words"))
    // the SIMPLE-mapping fold agreement cases: İ → i (the full mapping
    // would emit i + U+0307 and diverge from duckdb), ẞ → ß, ﬀ kept
    assert(toks("İstanbul ẞharp ﬀi") == Seq("istanbul", "ßharp", "ﬀi"))
    // zero tokens → the degrade [""] (consumers filter it)
    assert(toks("...!!!") == Seq(""))
  }

  test("uniWordNgrams == normWordNgrams on pure-ASCII text (property)") {
    val asciiGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.oneOf(" ", ".", ",!", "--", "?! "),
      Gen.oneOf("a", "Ab", "THE", "x1", "Paris", "FrAnCe9"),
      Gen.alphaNumStr.map(_.take(8)))).map(_.mkString)
    PropCheck.check(Prop.forAll(asciiGen) { s =>
      val u = TextKernels.uniWordNgrams(UTF8String.fromString(s), 3, true)
      val a = TextKernels.normWordNgrams(UTF8String.fromString(s), 3, true)
      (0 until u.numElements()).map(u.getUTF8String) ==
        (0 until a.numElements()).map(a.getUTF8String)
    })
  }

  test("uniWordNgrams is invariant under multilingual reflows (property)") {
    // words across scripts; CJK chars shingle per-character so inserted
    // punctuation and removed spaces never change the token sequence
    val word = Gen.oneOf("the", "Быстрая", "ЛИСА", "alpha9",
      "中", "文", "の", "타", "λεξη")
    PropCheck.check(Prop.forAll(Gen.listOf(word).map(_.mkString(" "))) { s =>
      val mangled = s.toUpperCase(java.util.Locale.ROOT)
        .replace(" ", "、 ，") + "。!!"
      def grams(x: String): Seq[String] = {
        val ad = TextKernels.uniWordNgrams(UTF8String.fromString(x), 3, true)
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      }
      grams(s) == grams(mangled)
    })
  }

  test("scriptProfile: per-script counts, priority tiebreak, none case") {
    def prof(s: String) = ScriptKernels.scriptProfile(UTF8String.fromString(s))
    val p = prof("Ωμέγα עברית العربية 中文かなハン한국 123 café мир")
    assert((0 until 7).map(p.getInt) == Seq(4, 3, 5, 7, 5, 8, 3),
      "latin(café)=4 cyr(мир)=3 greek=5 arabic=7 hebrew=5 cjk=8 digits=3")
    assert(p.getUTF8String(7).toString == "cjk")
    // combining marks are script=Inherited on BOTH sides (Java
    // UnicodeScript and RE2 agree): the fathatan between these two
    // Arabic letters counts toward no bucket
    assert(prof("بًا").getInt(3) == 2)
    // ties keep the PRIORITY order: 2 latin vs 2 cyrillic → latin
    assert(prof("abаб").getUTF8String(7).toString == "latin")
    // digits alone dominate nothing
    assert(prof("123 456").getUTF8String(7).toString == "none")
    assert(prof("").getUTF8String(7).toString == "none")
  }

  test("countSubstr: empty needle and overlap discipline") {
    assert(TextKernels.countSubstr(
      UTF8String.fromString("aaaa"), UTF8String.fromString("aa")) == 2L) // non-overlapping
    assert(TextKernels.countSubstr(
      UTF8String.fromString("x"), UTF8String.fromString("")) == 0L)
    assert(TextKernels.countSubstr(
      UTF8String.fromString(""), UTF8String.fromString("a")) == 0L)
  }

  test("countAsciiClass counts class chars only") {
    val m = CountAsciiClass.maskOf(".,!?;:")
    assert(TextKernels.countAsciiClass(UTF8String.fromString("a.b,c!日?"), m) == 4L)
    assert(TextKernels.countAsciiClass(UTF8String.fromString(""), m) == 0L)
  }

  test("column path: kernels == old regex formulations on a DataFrame") {
    import spark.implicits._
    val rows = Seq(
      "", " ", "\t", "the quick  brown\tfox", "\tlead tab", "trail tab\t",
      "a a a", "one", "日本語 テスト 日本語", "x   y", "a.b, c! d? e; f:",
      " the cat and the hat in the hat ")
    val df = rows.toDF("text")

    val oldTokens = when(length(trim($"text")) === 0,
      array().cast(ArrayType(StringType))).otherwise(split(trim($"text"), "\\s+"))
    val got = df.select(
      GraftFunctions.tokenizeWs($"text").as("nw"), oldTokens.as("old"),
      GraftFunctions.tokenCountWs($"text").as("nc"), size(oldTokens).as("oc"),
      GraftFunctions.distinctTokenCountWs($"text").as("nd"),
      size(array_distinct(oldTokens)).as("od"),
      GraftFunctions.sumTokenCharsWs($"text").as("ns"),
      aggregate(oldTokens, lit(0L), (acc, t) => acc + length(t)).as("os"),
      GraftFunctions.countSubstr($"text", lit(" the ")).as("nt"),
      ((length($"text") - length(regexp_replace($"text",
        java.util.regex.Pattern.quote(" the "), ""))) / lit(5)).cast("long").as("ot"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getInt(2) == r.getInt(3))
      assert(r.getInt(4) == r.getInt(5))
      assert(r.getLong(6) == r.getLong(7))
      assert(r.getLong(8) == r.getLong(9))
    }
  }

  test("SQL registration: tokenizer functions callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT token_count_ws(' a b  c '), size(tokenize_ws('x\ty z')), " +
        "distinct_token_count_ws('a b a'), distinct_ngram_count_ws('a b a b', 2), " +
        "sum_token_chars_ws('ab cde'), count_substr('abab', 'ab')").head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3 && r.getInt(2) == 2)
    assert(r.getInt(3) == 2 && r.getLong(4) == 5L && r.getLong(5) == 2L)
  }

  test("TextOps rewiring: metrics identical to the legacy formulations") {
    import spark.implicits._
    import graft.text.TextOps
    val df = Seq(
      "the quick brown fox jumps over the lazy dog.",
      "spam spam spam spam spam!!!", "", " ", "\tTabbed start",
      "Der Hund und die Katze und der Vogel und die Maus ist hier",
      "one two three four five six seven eight nine ten").toDF("text")

    val legacyToks = when(length(trim($"text")) === 0,
      array().cast(ArrayType(StringType))).otherwise(split(trim($"text"), "\\s+"))
    val legacy = df.select(
      when(size(legacyToks) <= 0, lit(0.0)).otherwise(
        round(lit(1.0) - size(array_distinct(legacyToks)).cast("double")
          / size(legacyToks).cast("double"), 6)).as("rep1"),
      {
        val total = size(legacyToks) - 2
        val grams = transform(sequence(lit(0), size(legacyToks) - 3),
          i => concat_ws(" ", slice(legacyToks, i + 1, lit(3))))
        when(total <= 0, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(grams)).cast("double")
            / total.cast("double"), 6)).as("rep3")
      },
      when(size(legacyToks) === 0, lit(0.0)).otherwise(
        aggregate(legacyToks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / size(legacyToks).cast("double")).as("mtl"),
      {
        val n = length($"text")
        when(n === 0, lit(0.0)).otherwise(
          (n - length(regexp_replace($"text", TextOps.PunctClass, ""))).cast("double")
            / n.cast("double")).as("pr")
      }).collect()
    val kernel = df.select(
      TextOps.repeatedTokenRatio($"text").as("rep1"),
      TextOps.repeatedNgramRatio($"text", 3).as("rep3"),
      TextOps.meanTokenLen($"text").as("mtl"),
      TextOps.punctRatio($"text").as("pr")).collect()
    legacy.zip(kernel).foreach { case (l, k) =>
      (0 until 4).foreach(i => assert(l.getDouble(i) == k.getDouble(i), s"col $i"))
    }
  }

  test("normalize_nfc: composes decomposed forms, ASCII fast path, idempotent") {
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(s: String): String =
      UnicodeKernels.nfc(UTF8String.fromString(s)).toString
    // combining acute composes; combining ring composes; the U+212B
    // angstrom singleton maps to U+00C5
    assert(nfc("cafe\u0301") == "caf\u00e9")
    assert(nfc("A\u030A") == "\u00c5")
    assert(nfc("\u212B") == "\u00c5")
    // already-composed and pure-ASCII inputs pass through unchanged —
    // and ASCII returns the SAME instance (zero-allocation fast path)
    assert(nfc("caf\u00e9") == "caf\u00e9")
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(UnicodeKernels.nfc(ascii) eq ascii)
    // idempotence on a mixed payload
    val mixed = "mixed cafe\u0301 and A\u030A with ascii"
    assert(nfc(nfc(mixed)) == nfc(mixed))
    // column path, codegen'd
    import spark.implicits._
    val df = Seq((1L, "cafe\u0301"), (2L, "plain")).toDF("id", "t")
    val out = df.select(GraftFunctions.normalizeNfc($"t").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("caf\u00e9", "plain"))
  }

  test("langId unchanged by the countSubstr swap") {
    import spark.implicits._
    import graft.text.TextOps
    val df = Seq(
      "the cat and the dog of the house", "der Hund und die Katze ist",
      "le chat et la maison est", "el perro y la casa es grande",
      "的是了在的是", "zzzz qqqq").toDF("text")
    val got = df.select(TextOps.langId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "es", "zh", "und"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BPE regex pretokenizer ([[Bpe.pretokens]]) pinned against its
  * driver-side reference ([[Bpe.pretokenize]]) on the inputs production
  * BPE exists for: punctuation fused to words, whitespace-free scripts
  * (CJK), combining marks, supplementary-plane emoji, the internal
  * U+001F separator, and Unicode spaces. The CROSS-ENGINE pin (Spark
  * regex == DuckDB RE2) is the `text_bpe_pretokens` gate. */
class BpePretokenSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    // punctuation fuses under \s+ tokenization; pretokens split it off
    "Dr. O'Neil's co-author (v2.0) said: \"well—really!?\" " +
      "…costs $1,234.56 at 3.14% markup.",
    // whitespace-free Japanese: every Han/kana code point its own pretoken
    "東京都は日本の首都です" +
      "。漢字とひらがな。",
    // whitespace-free Chinese
    "机器学习模型需要大量的" +
      "训练数据。",
    // Katakana + embedded Latin + digits
    "カタカナのversion2.0です!",
    // script boundary inside a \s+ token
    "mixed漢字inside",
    // combining mark rides its letter run (e + U+0301)
    "café combining",
    // Hangul is NOT padded (Korean is whitespace-delimited)
    "한국어 문장",
    // supplementary-plane emoji: an "other" run, surrogate-safe
    "emoji 🎉🎉 end",
    // the internal separator is stripped, never a pretoken
    "with\u001fsep and\u001f more",
    // ideographic space (U+3000) is NOT ASCII whitespace: "other" run
    "a　b",
    // vertical tab IS in the explicit whitespace class (both engines)
    "a\u000bb",
    "", "   ", "\t\n")

  test("column form matches the driver reference on adversarial inputs") {
    val df = adversarial.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    // both column forms: the native single-pass expression (production
    // path) and the two-regex spelling (the cross-engine definition)
    for (form <- Seq(Bpe.pretokens(_), Bpe.pretokensRegex(_))) {
      val got = df.select($"id", form($"text").as("pts"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      adversarial.zipWithIndex.foreach { case (t, i) =>
        assert(got(i) == Bpe.pretokenize(t).toSeq,
          s"pretokens diverged from driver reference on <$t>")
      }
    }
  }

  test("native single-pass pretokenizer == regex form on a seeded unicode fuzz") {
    // a code-point pool spanning every classification branch: ASCII
    // letters/digits/punct, explicit whitespace (incl. x0B), U+001F,
    // Latin-1 letters, combining marks, Han/Hiragana/Katakana, Hangul,
    // ideographic space, fullwidth punct, supplementary-plane emoji
    val pool: Array[Int] = Array(
      'a', 'Z', '5', '.', ',', '!', '$', ' ', '\t', '\n', 0x0b, '\r',
      0x1f, 0xe9, 0x301, 0x4e2d, 0x6587, 0x3042, 0x30ab, 0xd55c,
      0x3000, 0xff01, 0x1f389, 0x2014, 0x2026)
    val rnd = new scala.util.Random(1234)
    val texts = (0 until 500).map { _ =>
      val n = rnd.nextInt(40)
      val sb = new java.lang.StringBuilder()
      (0 until n).foreach(_ => sb.appendCodePoint(pool(rnd.nextInt(pool.length))))
      sb.toString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
    val native = df.select($"id", Bpe.pretokens($"text").as("p"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val regex = df.select($"id", Bpe.pretokensRegex($"text").as("p"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    texts.indices.foreach { i =>
      assert(native(i) == regex(i),
        s"fuzz divergence on <${texts(i)}>: ${native(i)} vs ${regex(i)}")
    }
    // and the native projection stays inside whole-stage codegen
    // (through parquet so ConvertToLocalRelation can't fold the plan)
    val tmp = java.nio.file.Files.createTempDirectory("pretok_cg").toString
    df.write.parquet(s"$tmp/docs")
    val plan = spark.read.parquet(s"$tmp/docs")
      .select(Bpe.pretokens($"text"))
      .queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("bpepretokensexpr"))
    assert(projLine.exists(_.trim.startsWith("*(")),
      s"BpePretokensExpr projection fell out of codegen:\n$plan")
  }

  test("pretokens never contain ASCII space or U+001F (tokenCounts join safety)") {
    // the whole-doc space-join trick in Bpe.tokenCounts requires that no
    // pretoken (hence no trained symbol) can ever contain the join char
    adversarial.foreach { t =>
      Bpe.pretokenize(t).foreach { p =>
        assert(p.nonEmpty && !p.contains(" ") && !p.contains("\u001f") &&
          !p.exists(c => c == '\t' || c == '\n' || c == '\u000b' ||
            c == '\f' || c == '\r'),
          s"pretoken <$p> of <$t> contains whitespace/separator")
      }
    }
  }

  test("specific splits: punctuation off, CJK per code point, Hangul intact") {
    assert(Bpe.pretokenize("word.").toSeq == Seq("word", "."))
    assert(Bpe.pretokenize("it's").toSeq == Seq("it", "'", "s"))
    assert(Bpe.pretokenize("v2.0").toSeq == Seq("v", "2", ".", "0"))
    assert(Bpe.pretokenize("漢字").toSeq == Seq("漢", "字"))
    assert(Bpe.pretokenize("한국어").toSeq == Seq("한국어"))
    assert(Bpe.pretokenize("café").toSeq == Seq("café"))
  }

  test("CJK word-frequency table is bounded by the character inventory") {
    // under \s+ tokenization each of these sentences is ONE freq-1 word
    // (the degenerate shape that silently breaks the maxWords cap); under
    // the pretokenizer the distinct-pretoken count is the CHARACTER
    // inventory — bounded however many near-unique sentences arrive
    val sents = (0 until 50).map { i =>
      (i.toLong,
        "東京都は日本の首都" +
          s"です。$i")
    }.toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(sents, "text").collect()
    val words = wf.map(_.getString(0)).toSet
    // 11 distinct CJK chars + the digit runs — nothing sentence-sized
    assert(words.forall(_.length <= 2), s"oversized pretoken in $words")
    assert(wf.map(_.getLong(1)).max >= 50L,
      "per-character frequencies should aggregate across sentences")
  }

  test("mixed-corpus compression gate reports sane per-variant chars/token") {
    val out = graft.queries.TrainingData
      .textBpeCompressionCjk(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 4, s"expected 4 variants, got ${out.length}")
    out.foreach { r =>
      val cpt = r.getDouble(r.fieldIndex("chars_per_token"))
      assert(cpt >= 0.9 && cpt <= 8.0,
        s"chars_per_token $cpt outside sane range for variant ${r.get(0)}")
      assert(r.getLong(r.fieldIndex("bpe_tokens")) > 0)
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE fit + apply: greedy leftmost merge semantics, tie-breaking,
  * early stop, OOV segmentation, and driver-fit == distributed-apply
  * agreement on the same corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the dominant pair first and fuses transitively") {
    // "aab" x3, "ab" x2: pairs a,a=3  a,b=5  -> (a,b) first with count 5
    val wf = Seq(("aab", 3L), ("ab", 2L)).toDF("word", "freq")
    val m = Bpe.train(wf, numMerges = 2)
    assert(m.head == Bpe.Merge(1, "a", "b", "ab", 5L))
    // after merge 1: "a|ab" x3, "ab" x2 -> pair (a,ab)=3
    assert(m(1) == Bpe.Merge(2, "a", "ab", "aab", 3L))
  }

  test("merge sweep is leftmost non-overlapping: aaa -> aa|a") {
    val wf = Seq(("aaa", 1L)).toDF("word", "freq")
    val m = Bpe.train(wf, numMerges = 1)
    assert(m == Seq(Bpe.Merge(1, "a", "a", "aa", 2L))) // overlapping count 2
    val seg = Seq("aaa").toDF("w")
      .select(Bpe.segments(col("w"), m).as("s")).as[Seq[String]].head()
    assert(seg == Seq("aa", "a"))
  }

  test("count ties break by UTF-8 byte order on (first, second)") {
    // "ba" and "ab" each once: counts tie at 1 -> (a,b) wins over (b,a)
    val wf = Seq(("ba", 1L), ("ab", 1L)).toDF("word", "freq")
    val m = Bpe.train(wf, numMerges = 1)
    assert(m.head.first == "a" && m.head.second == "b")
  }

  test("stops early when every word is one symbol") {
    val wf = Seq(("ab", 5L)).toDF("word", "freq")
    val m = Bpe.train(wf, numMerges = 10)
    assert(m == Seq(Bpe.Merge(1, "a", "b", "ab", 5L)))
  }

  test("maxWords cap keeps the most frequent words") {
    val wf = Seq(("xy", 100L), ("zq", 1L)).toDF("word", "freq")
    val m = Bpe.train(wf, numMerges = 1, maxWords = 1)
    assert(m.head.merged == "xy" && m.head.pairCount == 100L)
  }

  test("OOV words segment toward characters under learned merges") {
    val wf = Seq(("hello", 10L)).toDF("word", "freq")
    val m = Bpe.train(wf, numMerges = 2)
    val seg = Seq("help").toDF("w")
      .select(Bpe.segments(col("w"), m).as("s")).as[Seq[String]].head()
    // merges fit on "hello" still apply partially; pieces re-concatenate
    assert(seg.mkString == "help")
    assert(seg.nonEmpty && seg.size <= 4)
  }

  test("distributed segmentation count == driver fit on the same words") {
    val docs = Seq(
      (1L, "spark spark sort sorted"),
      (2L, "sort spark window"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 4)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq

    // independent driver-side segmentation with the same merge list
    def seg(word: String): Int = {
      var syms = word.split("").toSeq
      merges.foreach { m =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m.first && syms(i + 1) == m.second) {
            out += m.merged; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.size
    }
    val want = Seq(
      (1L, "spark spark sort sorted"), (2L, "sort spark window"), (3L, ""))
      .map { case (id, t) =>
        val ws = t.split("\\s+").filter(_.nonEmpty).toSeq
        (id, ws.size.toLong, ws.map(seg).sum.toLong)
      }
    assert(got == want)
  }

  test("merges never cross symbol boundaries (the h|er hazard)") {
    // after (e,r), "her" is [h, er]; the later merge (h,e) must NOT
    // string-match h + the 'e' INSIDE "er" — the exact failure mode a
    // single-separator representation has (see Bpe.Sep scaladoc)
    val m = Seq(Bpe.Merge(1, "e", "r", "er", 0L),
      Bpe.Merge(2, "h", "e", "he", 0L))
    def seg(w: String): Seq[String] = Seq(w).toDF("w")
      .select(Bpe.segments(col("w"), m).as("s")).as[Seq[String]].head()
    assert(seg("her") == Seq("h", "er"))
    assert(seg("he") == Seq("he"))
    assert(seg("hear") == Seq("he", "a", "r"))
    assert(seg("here") == Seq("h", "er", "e"))
    // suffix-side hazard: after (b,c), merge (a,b) must not fuse the
    // 'b' inside "bc" with a preceding 'a'
    val m2 = Seq(Bpe.Merge(1, "b", "c", "bc", 0L),
      Bpe.Merge(2, "a", "b", "ab", 0L))
    val s2 = Seq("abc").toDF("w")
      .select(Bpe.segments(col("w"), m2).as("s")).as[Seq[String]].head()
    assert(s2 == Seq("a", "bc"))
  }

  test("self-overlapping runs stay leftmost-greedy: aaaaaa -> aa|aa|aa") {
    val m = Seq(Bpe.Merge(1, "a", "a", "aa", 0L))
    val seg = Seq("aaaaaa").toDF("w")
      .select(Bpe.segments(col("w"), m).as("s")).as[Seq[String]].head()
    assert(seg == Seq("aa", "aa", "aa"))
    val seg5 = Seq("aaaaa").toDF("w")
      .select(Bpe.segments(col("w"), m).as("s")).as[Seq[String]].head()
    assert(seg5 == Seq("aa", "aa", "a"))
  }

  test("vocabulary counts pieces weighted by word frequency") {
    // merges fit on: "abab" x3, "ab" x2 -> (a,b) cnt 8, then (ab,ab) cnt 3
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val merges = Bpe.train(wf, numMerges = 2)
    assert(merges.map(_.merged) == Seq("ab", "abab"))
    val vocab = Bpe.vocabulary(wf, merges)
      .as[(String, Long)].collect().toMap
    // "abab" -> [abab] x3; "ab" -> [ab] x2
    assert(vocab == Map("abab" -> 3L, "ab" -> 2L))
  }

  test("save/load round-trips the artifact; a foreign table fails the load") {
    val root = java.nio.file.Files.createTempDirectory("bpe").toString
    val wf = Seq(("spark", 5L), ("sort", 3L)).toDF("word", "freq")
    val merges = Bpe.train(wf, numMerges = 3)
    Bpe.save(spark, merges, s"$root/merges")
    assert(Bpe.load(spark, s"$root/merges") == merges)

    // rank gap -> fail fast at load, not silent mis-segmentation at apply
    Seq(Bpe.Merge(1, "a", "b", "ab", 5L), Bpe.Merge(3, "c", "d", "cd", 2L))
      .toDF().write.parquet(s"$root/torn")
    val e1 = intercept[IllegalArgumentException](Bpe.load(spark, s"$root/torn"))
    assert(e1.getMessage.contains("non-contiguous"))

    // merged != first+second -> corrupt row named
    Seq(Bpe.Merge(1, "a", "b", "xy", 5L))
      .toDF().write.parquet(s"$root/corrupt")
    val e2 = intercept[IllegalArgumentException](Bpe.load(spark, s"$root/corrupt"))
    assert(e2.getMessage.contains("corrupt merge row 1"))

    // publish is staged: no .tmp left behind
    assert(!new java.io.File(s"$root/merges.tmp").exists())
  }

  test("segmented pieces always re-concatenate to the word") {
    val docs = Seq((1L, "interchangeable redistributions")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 6)
    val pieces = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(col("w"), Bpe.segments(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect()
    pieces.foreach { case (w, s) => assert(s.mkString == w) }
  }

  // ---- production-vocab path: incremental fit + native segmenter ----

  /** The pre-rewrite naive fit — full pair recount + replace sweep per
    * rank — kept as the spec-side reference the incremental trainer is
    * pinned against. */
  private def naiveTrain(words: Seq[(String, Long)], numMerges: Int): Seq[Bpe.Merge] = {
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    var ws = words.map { case (w, f) => (w.split("").toSeq, f) }
    val out = Seq.newBuilder[Bpe.Merge]
    var rank = 1
    var go = true
    while (go && rank <= numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      ws.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts.update((a, b), counts.getOrElse((a, b), 0L) + f)
          case _ =>
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((a, b), cnt) = counts.toSeq.minBy(identity)(Ordering.fromLessThan {
          (x, y) =>
            x._2 > y._2 || (x._2 == y._2 && (utf8Lt(x._1._1, y._1._1) ||
              (x._1._1 == y._1._1 && utf8Lt(x._1._2, y._1._2))))
        })
        out += Bpe.Merge(rank, a, b, a + b, cnt)
        ws = ws.map { case (syms, f) =>
          val o = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              o += a + b; i += 2
            } else { o += syms(i); i += 1 }
          }
          (o.result(), f)
        }
      }
      rank += 1
    }
    out.result()
  }

  test("incremental fit is bit-identical to a naive full recount at 300 merges") {
    // a pseudo-random corpus with a deep merge hierarchy: structured
    // syllables so pairs chain (fused symbols keep merging)
    val rnd = new scala.util.Random(42)
    val sylls = Array("ka", "to", "mi", "ra", "su", "ne", "pol", "vex", "qua")
    val words = (1 to 800).map { _ =>
      (1 to (1 + rnd.nextInt(4))).map(_ => sylls(rnd.nextInt(sylls.length))).mkString
    }.groupBy(identity).map { case (w, g) => (w, g.size.toLong * (1 + rnd.nextInt(5))) }.toSeq
    val wf = words.toDF("word", "freq")
    val fast = Bpe.train(wf, numMerges = 300)
    val slow = naiveTrain(words, 300)
    assert(fast.size == slow.size, s"${fast.size} vs ${slow.size} merges")
    fast.zip(slow).foreach { case (f, s) => assert(f == s, s"diverged at rank ${f.rank}: $f vs $s") }
  }

  test("native segmenter == replace chain, in-plan, at a chain-sized table") {
    val docs = Seq(
      (1L, "interchangeable redistributions of sparkly bpe segmentations"),
      (2L, "aaa aaaa abab her hear here"),
      (3L, ""),
      (4L, "unicode \u00e9l\u00e8ve \u00fcber stra\u00dfe")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 40)
    assert(merges.size == 40 || merges.nonEmpty)
    val joined = trim(regexp_replace(col("text"), "\\s+", " "))
    val both = docs.select(col("doc_id"),
        Bpe.segmentedChain(joined, merges).as("chain"),
        Bpe.segmentedNative(joined, merges).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: chain != native") }
  }

  test("segmented dispatches to the native form above ChainLimit; token counts match a driver reference at 1500 merges") {
    // corpus with enough pair depth to learn >1k merges
    val rnd = new scala.util.Random(7)
    val sylls = Array("ka", "to", "mi", "ra", "su", "ne", "pol", "vex",
      "qua", "zim", "or", "eth", "an", "ul")
    // through parquet, so ConvertToLocalRelation can't fold the whole
    // projection into a LocalTableScan (the codegen assert below needs
    // a live plan)
    val tmp = java.nio.file.Files.createTempDirectory("bpe_big").toString
    (1L to 400L).map { i =>
      (i, (1 to 30).map(_ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => sylls(rnd.nextInt(sylls.length))).mkString)
        .mkString(" "))
    }.toDF("doc_id", "text").write.parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 1500)
    assert(merges.size > Bpe.ChainLimit,
      s"fixture too shallow: ${merges.size} merges") // dispatch is exercised
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap

    // independent driver-side reference: per word, the full replace chain
    val table = merges.map(m => (m.first, m.second)).toArray
    def segCount(word: String): Long = {
      var syms = word.split("").toSeq
      table.foreach { case (a, b) =>
        if (syms.length >= 2) {
          val o = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              o += a + b; i += 2
            } else { o += syms(i); i += 1 }
          }
          syms = o.result()
        }
      }
      syms.size.toLong
    }
    val texts = docs.as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      val want = (ws.length.toLong, ws.map(segCount).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }

    // and the native projection stays inside whole-stage codegen
    val plan = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix IS the whole-stage-codegen marker in the
    // executed-plan string; a CodegenFallback projection prints bare
    val projLine = plan.linesIterator.find(_.contains("bpesegmentexpr"))
    assert(projLine.exists(_.trim.startsWith("*(")),
      s"BpeSegmentExpr projection fell out of codegen:\n$plan")
  }

  test("production vocabulary end-to-end: 10k merges trained, native segment parity") {
    // closes the gap between "plans at 10k-50k merges" and "shown at
    // 10k": the incremental trainer fits a full 10k-rank table on a
    // synthetic corpus and BpeSegmentExpr segments through it with
    // bit-exact parity against an independent per-rank driver sweep.
    // Random-ish 12-16 char words make late merges word-specific, so
    // the rank supply comfortably exceeds 10k.
    val rnd = new scala.util.Random(42)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val words = (1 to 3000).map { _ =>
      (1 to (12 + rnd.nextInt(5))).map(_ => letters(rnd.nextInt(26))).mkString
    }.distinct
    val tmp = java.nio.file.Files.createTempDirectory("bpe_10k").toString
    words.zipWithIndex.groupBy(_._2 % 300).toSeq
      .map { case (d, ws) => (d.toLong, ws.map(_._1).mkString(" ")) }
      .toDF("doc_id", "text").write.parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")

    val t0 = System.nanoTime()
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"),
      numMerges = 10000)
    val fitSec = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 10000, s"corpus exhausted at ${merges.size} merges")

    // independent reference: the chain semantics, one leftmost sweep per
    // rank, early exit once a word is fully fused
    val table = merges.map(m => (m.first, m.second)).toArray
    def refSegments(word: String): Seq[String] = {
      var syms: Array[String] = Bpe.codePointSplit(word)
      var r = 0
      while (r < table.length && syms.length >= 2) {
        syms = Bpe.sweep(syms, table(r)._1, table(r)._2)
        r += 1
      }
      syms.toSeq
    }

    // full segmentation parity over EVERY distinct word, through the
    // 10k-entry compiled table (native path: 10000 > ChainLimit)
    val t1 = System.nanoTime()
    val segGot = words.toDF("w")
      .select($"w", Bpe.segments($"w", merges).as("segs"))
      .as[(String, Seq[String])].collect().toMap
    val applySec = (System.nanoTime() - t1) / 1e9
    words.foreach { w =>
      assert(segGot(w) == refSegments(w), s"segment mismatch on <$w>")
    }

    // and the doc-level production entry agrees
    val got = Bpe.tokenCountsNative(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    docs.as[(Long, String)].collect().foreach { case (id, t) =>
      val ws = Bpe.pretokenize(t)
      val want = (ws.length.toLong, ws.map(w => refSegments(w).size.toLong).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    info(f"fit 10000 merges: $fitSec%.1f s; " +
      f"native segment of ${words.size} distinct words: $applySec%.2f s")
  }

  test("native segmenter rejects non-string input at analysis time") {
    val merges = Seq(Bpe.Merge(1, "a", "b", "ab", 2L))
    val df = Seq((1, 42)).toDF("id", "n")
    // ExpectsInputTypes turns misuse into a clean AnalysisException
    // instead of a runtime ClassCastException inside codegen
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Bpe.segmentedNative($"n", merges)).collect()
    }
  }

  test("U+001F in document text is stripped, not treated as a boundary") {
    // the control char is the INTERNAL separator; crawl text containing
    // it must not corrupt token counts or segmentation (ADVICE class)
    val dirty = "hello\u001f \u001f\u001f world\u001fly"
    val clean = "hello  world ly".replace("world ly", "worldly") // == strip
    val docs = Seq((1L, dirty), (2L, "hello worldly")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 8)
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // doc 1 strips to exactly doc 2's words -> identical counts
    assert(counts(1L) == counts(2L), s"$counts")
    // both segmented forms agree on hostile input too
    val joined = trim(regexp_replace(translate(col("text"),
      "\u001f", ""), "\\s+", " "))
    val both = docs.select(
        Bpe.segmentedChain(col("text"), merges).as("chain"),
        Bpe.segmentedNative(col("text"), merges).as("native"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("byte codec: bijection shape, round-trip fuzz incl. non-BMP and garbage") {
    // the map itself: total bijection, images printable, never
    // whitespace / U+001F / marks (the properties the machinery relies on)
    assert(Bpe.ByteToChar.length == 256 &&
      Bpe.ByteToChar.distinct.length == 256)
    Bpe.ByteToChar.foreach { cp =>
      assert(cp >= 33 && cp < 512 && cp != 0x1f)
      assert(!Character.isWhitespace(cp) && Character.getType(cp) !=
        Character.NON_SPACING_MARK)
    }
    assert((33 to 126).forall(b => Bpe.ByteToChar(b) == b),
      "printable ASCII must self-map (the ASCII cross-check gate relies on it)")

    // seeded fuzz over a hostile code-point pool: decode(encode(x)) == x
    // and encoded length in CHARS == input length in BYTES
    val rng = new scala.util.Random(4242)
    val pool: IndexedSeq[Int] = IndexedSeq(
      0x41, 0x7a, 0x20, 0x09, 0x1f, 0x00, 0x7f, 0x85, 0xa0, 0xe9, 0x301,
      0x378, 0x3000, 0x4e2c, 0x30ab, 0xe000, 0xfe0f, 0x200d, 0xfffd,
      0x1f680, 0x1f469, 0x20bb7, 0x10ffff)
    val samples = (1 to 500).map { _ =>
      val n = rng.nextInt(12)
      val sb = new java.lang.StringBuilder()
      (0 until n).foreach(_ => sb.appendCodePoint(pool(rng.nextInt(pool.size))))
      sb.toString
    } :+ "" :+ graft.queries.TrainingData.BytePhrases.mkString(" ")
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("id"), col("s"),
        Bpe.byteEncode(col("s")).as("enc"),
        Bpe.byteDecode(Bpe.byteEncode(col("s"))).as("rt"))
    df.collect().foreach { r =>
      val s = r.getString(1); val enc = r.getString(2)
      assert(r.getString(3) == s, s"round-trip broke for ${s.toList}")
      assert(enc.codePointCount(0, enc.length) ==
        s.getBytes("UTF-8").length, "encoded chars != input bytes")
      assert(!enc.exists(c => c == '\u001f' || Character.isWhitespace(c)),
        "encoded alphabet leaked a separator or whitespace")
    }
    // decode of a non-image string is null, not garbage
    assert(Seq(Tuple1("丬")).toDF("s")
      .select(Bpe.byteDecode(col("s"))).collect().head.isNullAt(0))
  }

  test("byte base == char base on ASCII; byte apply native == chain on garbage") {
    val ascii = Seq(
      (1L, "low lower lowest newer newest new"),
      (2L, "the lower bound is lower than the newest estimate"),
      (3L, "new lines for lower costs, newer links!"))
      .toDF("doc_id", "text")
    val charMerges = Bpe.train(Bpe.wordFrequencies(ascii, "text"), 10)
    val byteMerges = Bpe.train(Bpe.wordFrequenciesBytes(ascii, "text"), 10)
    assert(byteMerges == charMerges,
      "byte-base fit diverged from char-base on pure ASCII")
    val charCounts = Bpe.tokenCounts(ascii, "doc_id", "text", charMerges)
      .orderBy("doc_id").collect().toSeq
    val byteCounts = Bpe.tokenCountsBytes(ascii, "doc_id", "text", byteMerges)
      .orderBy("doc_id").collect().toSeq
    assert(byteCounts == charCounts,
      "byte-base apply diverged from char-base on pure ASCII")

    // garbage corpus: the byte-base fit is consumable by the NATIVE
    // segmenter unchanged, bit-identical to the replace chain
    val garbage = graft.queries.TrainingData.BytePhrases.zipWithIndex
      .map { case (p, i) => (i.toLong, s"doc $i says $p again $p") }
      .toDF("doc_id", "text")
    val gm = Bpe.train(Bpe.wordFrequenciesBytes(garbage, "text"), 20)
    val chain = Bpe.tokenCountsWith(garbage, "doc_id", "text", gm,
        Bpe.segmentedChain, Nil, Bpe.byteEncode)
      .orderBy("doc_id").collect().toSeq
    val native = Bpe.tokenCountsWith(garbage, "doc_id", "text", gm,
        Bpe.segmentedNative, Nil, Bpe.byteEncode)
      .orderBy("doc_id").collect().toSeq
    assert(native == chain, "native segmenter diverged on byte symbols")
    // byte-base token counts are positive and finite on every doc
    chain.foreach(r => assert(r.getLong(r.fieldIndex("n_bpe_tokens")) > 0))
  }
}

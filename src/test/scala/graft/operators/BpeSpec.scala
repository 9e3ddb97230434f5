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
}

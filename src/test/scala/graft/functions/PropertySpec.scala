package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the pure semantic carriers (SURVEY §5: the reference
  * has none; these pin the invariants the golden tests can't enumerate).
  * ScalaCheck generators sampled with a fixed seed (no scalatestplus
  * bridge in the offline cache). */
object Gens {
  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
}

class PathPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val compGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
  private val pathGen = Gen.nonEmptyListOf(compGen).map(_.take(6))

  test("normalizePath is idempotent and ancestors count equals hlevel") {
    val paths = Gens.samples(pathGen, 60).map(_.mkString("\\", "\\", "\\"))
    val rows = paths.toDF("p")
      .select(
        PathFunctions.normalizePath($"p").as("n1"),
        PathFunctions.normalizePath(PathFunctions.normalizePath($"p")).as("n2"),
        size(PathFunctions.ancestorPaths($"p")).as("na"),
        PathFunctions.hlevel($"p").as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1)) // idempotent
      assert(r.getInt(2) == r.getInt(3)) // |ancestors| == depth
    }
  }

  test("instrFromEnd agrees with a naive scan") {
    def naive(s: String, sub: String, k: Int): Int = {
      val hits = Iterator.iterate(s.indexOf(sub))(i => s.indexOf(sub, i + 1))
        .takeWhile(_ >= 0).toSeq
      if (hits.size < k) 0 else hits(hits.size - k) + 1
    }
    val strGen = Gen.listOfN(6, Gen.oneOf("a", "b", "\\")).map(_.mkString)
    val cases = Gens.samples(Gen.zip(strGen, Gen.choose(1, 4)), 80)
    val df = cases.toDF("s", "k")
    (1 to 4).foreach { k =>
      val got = cases.filter(_._2 == k).map(_._1).toDF("s")
        .select($"s", PathFunctions.instrFromEnd($"s", "\\", k)).collect()
      got.foreach(r => assert(r.getInt(1) == naive(r.getString(0), "\\", k),
        s"s=${r.getString(0)} k=$k"))
    }
  }
}

class TimepointPropertySpec extends AnyFunSuite {

  test("timepointMinutes: unit-first form scales linearly per unit") {
    val units = Seq("minute" -> 1.0, "hour" -> 60.0, "day" -> 1440.0,
      "week" -> 10080.0, "month" -> 43200.0, "year" -> 518400.0)
    val cases = Gens.samples(Gen.zip(Gen.choose(-50, 50), Gen.oneOf(units)), 100)
    cases.foreach { case (n, (name, factor)) =>
      val got = MetadataXml.timepointMinutes(s"${name.capitalize} $n")
      assert(got.contains(n * factor), s"$name $n")
    }
  }

  test("interval form equals the sum of its parts") {
    val cases = Gens.samples(
      Gen.zip(Gen.choose(0, 30), Gen.choose(0, 23), Gen.choose(0, 59)), 100)
    cases.filter { case (d, h, m) => d + h + m > 0 }.foreach { case (d, h, m) =>
      val got = MetadataXml.timepointMinutes(s"$d days $h hours $m minutes")
      assert(got.contains(d * 1440.0 + h * 60.0 + m * 1.0), s"$d $h $m")
    }
  }
}

class TextHashPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta",
    "x", "y", "zz", "多字", "mots")
  private val textGen = Gen.listOf(wordGen).map(_.mkString(" "))

  test("native minhash equals the relational signature build on random texts") {
    val texts = Gens.samples(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val native = df.select($"doc_id", TextHash.minhash($"text", 2, 6).as("mh"))
      .filter($"mh".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val relational = graft.operators.Dedup.minhashSignatures(
        graft.operators.Dedup.docShingles(df, "doc_id", "text", 2), 6)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getString).toList).toMap
    assert(native == relational)
  }

  test("repetition in [0,1]; simhash invariant under whitespace runs") {
    val texts = Gens.samples(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val reps = df.select(
      graft.operators.TextAnalysis.repetitionScore($"text", 3).as("r"))
      .collect().map(_.getDouble(0))
    assert(reps.forall(r => r >= 0.0 && r <= 1.0))
    val pairs = df
      .select($"doc_id",
        TextHash.simhash64($"text").as("a"),
        TextHash.simhash64(regexp_replace($"text", " ", "   ")).as("b"))
      .filter($"a".isNotNull).collect()
    pairs.foreach(r => assert(r.getString(1) == r.getString(2)))
  }

  test("segmentDedup: unique corpora keep everything; exact copies lose everything") {
    // suffix every token with its doc id -> no cross-doc segment can repeat
    val texts = Gens.samples(textGen, 40).zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t.split("\\s+").filter(_.nonEmpty)
          .map(w => s"${w}_$i").mkString(" ")) }
      .filter(_._2.nonEmpty)
    val out = graft.operators.Dedup.segmentDedup(
        texts.toDF("doc_id", "text"), "doc_id", "text", segTokens = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, t) =>
      val r = out(id)
      assert(r.getAs[Long]("n_removed") == 0L)
      // reassembly of an untouched doc is the token-normalized original
      assert(r.getAs[String]("clean_text") ==
        t.split("\\s+").filter(_.nonEmpty).mkString(" "))
      assert(r.getAs[Long]("n_segments") ==
        (t.split("\\s+").count(_.nonEmpty) + 2) / 3)
    }
    // an exact copy keeps nothing: every segment's owner is the lower id
    val dup = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val o2 = graft.operators.Dedup.segmentDedup(dup, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))).toMap
    assert(o2(1L) == ((0L, "a b c d e f g")))
    assert(o2(2L) == ((3L, "")))
  }

  test("canonicalUrl is idempotent over the generated URL space") {
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map("h" + _.mkString.take(8))
    val urlGen = for {
      scheme <- Gen.oneOf("", "http://", "https://", "HTTPS://")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- seg
      path <- Gen.listOf(seg).map(_.take(3))
      slash <- Gen.oneOf("", "/")
      frag <- Gen.oneOf("", "#frag", "#a/b?c")
      utm <- Gen.oneOf("", "?utm_source=x", "?utm_source=x&utm_medium=y")
    } yield scheme + www + (host +: path).mkString(".") + slash + utm + frag
    val urls = Gens.samples(urlGen, 80)
    val rows = urls.toDF("u").select(
      graft.operators.Dedup.canonicalUrl($"u").as("c1"),
      graft.operators.Dedup.canonicalUrl(
        graft.operators.Dedup.canonicalUrl($"u")).as("c2"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("tfidf ranks are contiguous per doc and scores non-increasing") {
    val texts = Gens.samples(textGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.filter(_._2.trim.nonEmpty)
    val out = graft.operators.TermStats.tfidfTopTerms(
        texts.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .collect()
      .groupBy(_.getLong(0))
    out.values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}

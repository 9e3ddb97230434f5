package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial hot-bucket audit for the banded pair generators: at
  * web-corpus scale a degenerate bucket (boilerplate texts sharing a band
  * key, near-black images sharing an aHash slice) is a certainty, and the
  * r8 groupBy+collect_list shape piled the whole bucket into ONE
  * aggregation buffer and emitted C(n,2) pairs from a single unsplittable
  * task. The r9 self-join shape must stream the same pairs through a
  * shuffle join (AQE-skew-splittable) — these specs push a bucket three
  * orders of magnitude hotter than any organic test fixture through each
  * generator and check the exact pair set against driver-side brute force.
  */
class HotBucketSpec extends SparkSpec {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  test("hammingPairs64: one slice shared by 3000 docs — exact pair set, no single-task blowup") {
    // every hash shares band-0 slice "0000" => ALL C(3000,2) = 4,498,500
    // pairs are candidates; the remaining 48 bits are md5-derived, so the
    // surviving (hamming <= 3) set is a deterministic, brute-forceable
    // handful. Three planted near-dups guarantee non-empty output.
    val n = 3000
    def hash(i: Long): String =
      if (i >= n - 3) "0000" + md5Hex("planted").take(11) + i.toString.takeRight(1)
      else "0000" + md5Hex(s"doc$i").take(12)
    val rows = (0L until n).map(i => (i, hash(i)))
    val df = spark.createDataFrame(rows).toDF("doc_id", "h64")
    val got = Dedup.hammingPairs64(df, "doc_id", "h64", maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    // driver-side brute force over the same hashes
    def bits(h: String): Long = java.lang.Long.parseUnsignedLong(h, 16)
    val hs = (0L until n).map(i => i -> bits(hash(i)))
    val expected = (for {
      (ia, ha) <- hs.iterator
      (ib, hb) <- hs.iterator if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet

    assert(expected.nonEmpty, "fixture must plant at least one near-dup pair")
    assert(got == expected)
  }

  test("minhashLsh: 800 identical texts land in one band bucket and verify as C(800,2) pairs") {
    // identical text => identical signature => every band bucket holds all
    // 800 docs; the verify stage must confirm all 319,600 pairs at
    // jaccard 1.0 without one task owning the whole bucket's pair set
    val n = 800
    val rows = (0L until n).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() === 0L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TreeOpsSpec extends SparkSpec {
  import spark.implicits._

  private val leaves = Seq(
    ("\\S\\Vitals\\HR\\", 1L),
    ("\\S\\Vitals\\BP\\", 1L),
    ("\\S\\Vitals\\HR\\", 2L),
    ("\\S\\Labs\\Glucose\\", 3L)).toDF("path", "patient")

  test("fillInTree materializes every ancestor once") {
    val nodes = TreeOps.fillInTree(leaves, "path")
    assert(nodes.count() == 6) // \S\, \S\Vitals\, \S\Labs\, + 3 leaves
    val root = nodes.filter($"c_fullname" === "\\S\\").collect()(0)
    assert(root.getAs[Int]("c_hlevel") == 1 && root.getAs[String]("c_name") == "S")
  }

  test("conceptCounts rolls distinct patients up the tree") {
    val counts = TreeOps.conceptCounts(leaves, "path", "patient")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("\\S\\") == 3)
    assert(counts("\\S\\Vitals\\") == 2)
    assert(counts("\\S\\Vitals\\HR\\") == 2)
    assert(counts("\\S\\Labs\\Glucose\\") == 1)
  }

  test("childrenCounts + visualAttrs: folders vs leaves") {
    val nodes = TreeOps.fillInTree(leaves, "path")
    val kids = TreeOps.childrenCounts(nodes, "c_fullname")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kids("\\S\\") == 2 && kids("\\S\\Vitals\\") == 2 && kids("\\S\\Labs\\") == 1)
    val attrs = TreeOps.visualAttrs(nodes, "c_fullname")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(attrs("\\S\\Vitals\\") == "FA" && attrs("\\S\\Vitals\\HR\\") == "LA")
  }
}

class NodeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tables = TreeOps.NodeTables(
    conceptDimension = Seq(("\\T\\A\\", "CA", "GS1"), ("\\T\\B\\", "CB", "GS1"))
      .toDF("concept_path", "concept_cd", "sourcesystem_cd"),
    i2b2 = Seq(
      ("\\T\\A\\", 2, "A", "LA", "CA", "GS1"),
      ("\\T\\B\\", 2, "B", "LH", "CB", "GS1")) // B hidden (2nd attr char H)
      .toDF("c_fullname", "c_hlevel", "c_name", "c_visualattributes",
        "c_basecode", "sourcesystem_cd"),
    observationFact = Seq((1L, "CA"), (2L, "CB"), (3L, "CX"))
      .toDF("patient_num", "concept_cd"))

  test("addNodes replaces listed paths, drops their facts, deterministic codes") {
    val r = TreeOps.addNodes(spark, tables, Seq("\\T\\A\\", "\\T\\New\\"), Some("GS1"))
    // replaced node CA's facts gone, others kept
    assert(r.observationFact.collect().map(_.getAs[String]("concept_cd")).toSet == Set("CB", "CX"))
    val cd = r.conceptDimension.collect()
      .map(x => x.getAs[String]("concept_path") -> x.getAs[String]("concept_cd")).toMap
    assert(cd.keySet == Set("\\T\\A\\", "\\T\\B\\", "\\T\\New\\"))
    assert(cd("\\T\\A\\") != "CA" && cd("\\T\\A\\").length == 16) // re-minted code
    val added = r.i2b2.filter($"c_fullname" === "\\T\\New\\").collect()(0)
    assert(added.getAs[String]("c_visualattributes") == "FA")
    assert(added.getAs[String]("c_name") == "New")
    assert(added.getAs[Int]("c_hlevel") == 2)
  }

  test("hidden-node cleanup removes H nodes with their facts; deleteNode exact path") {
    val r = TreeOps.deleteHiddenNodes(tables, "\\T\\")
    assert(r.i2b2.collect().map(_.getAs[String]("c_fullname")).toSeq == Seq("\\T\\A\\"))
    assert(r.observationFact.collect().map(_.getAs[String]("concept_cd")).toSet == Set("CA", "CX"))
    val one = TreeOps.deleteNode(tables, "\\T\\A\\")
    assert(one.i2b2.collect().map(_.getAs[String]("c_fullname")).toSeq == Seq("\\T\\B\\"))
    assert(TreeOps.deleteNode(tables, "%").i2b2.count() == 2) // guard: no-op
  }
}

class EavSpec extends SparkSpec {
  import spark.implicits._

  private val wide = Seq(
    ("P1", "45", "Male"),
    ("P2", "50", "Female"),
    ("P3", "", "Female")).toDF("subj", "age", "sex")

  test("explodeToEav drops empty values") {
    val eav = Eav.explodeToEav(wide, Seq("subj"), Seq("age", "sex"))
    assert(eav.count() == 5) // P3 age empty -> dropped
  }

  test("inferTypes: group is numeric only if every value casts") {
    val types = Eav.inferTypes(Eav.explodeToEav(wide, Seq("subj"), Seq("age", "sex")),
      Seq("attribute")).collect().map(r =>
      r.getAs[String]("attribute") -> r.getAs[String]("inferred_type")).toMap
    assert(types == Map("age" -> "N", "sex" -> "T"))
  }

  test("toObservationFact: tval 'E' for numeric, nval null for text") {
    val fact = Eav.toObservationFact(
      Eav.explodeToEav(wide, Seq("subj"), Seq("age", "sex")), Seq("attribute"))
    val age = fact.filter($"subj" === "P1" && $"attribute" === "age").collect()(0)
    assert(age.getAs[String]("tval_char") == "E" && age.getAs[Double]("nval_num") == 45.0)
    val sex = fact.filter($"subj" === "P1" && $"attribute" === "sex").collect()(0)
    assert(sex.getAs[String]("tval_char") == "Male" && sex.isNullAt(sex.fieldIndex("nval_num")))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words entirely here now ok")).toDF("doc_id", "text")

  test("exact dedup keeps min id") {
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == 3)
    val dup = d.filter($"n_copies" === 2).collect()(0)
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("contamination: benchmark leakage ratio, broadcast bench side") {
    // doc 1 is IN the benchmark -> its corpus twin (2) is fully
    // contaminated; the near-dup (3) partially; the unrelated doc not at all
    val bench = docs.filter($"doc_id" === 1L)
    val corpus = docs.filter($"doc_id" > 1L)
    val c = Dedup.contamination(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("contamination")).toMap
    assert(c(2L) == 1.0)
    assert(c(3L) > 0.0 && c(3L) < 1.0)
    assert(c(4L) == 0.0)
    // the benchmark shingle set broadcasts; the corpus never self-joins
    val plan = Dedup.contamination(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("contaminationSpans: exact 1-based positions, repeats kept, short docs empty") {
    val bench = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq(
      // the leaked 3-gram occurs TWICE (positions 2 and 6) -> two spans
      (10L, "zero alpha beta gamma four alpha beta gamma"),
      (11L, "nothing shared with the benchmark set here"),
      (12L, "too short")) // < n tokens: no shingles, no rows
      .toDF("doc_id", "text")
    val got = Dedup.contaminationSpans(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(got == Seq(
      (10L, 2L, "alpha beta gamma"),
      (10L, 6L, "alpha beta gamma")))
    // broadcast shape like contamination: no corpus self-join
    val plan = Dedup.contaminationSpans(corpus, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("ngramJaccard finds exact and near duplicates") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.head._3 == 1.0) // identical docs
  }

  test("native shingles expression matches the declarative HOF form") {
    val tricky = Seq(
      (1L, "a b c d e"),
      (2L, "a  b\tc"),          // multi-space + tab separators
      (3L, "x y"),              // fewer tokens than n -> empty
      (4L, "a b a b a b a b"),  // duplicate shingles -> distinct, in order
      (5L, "  leading and trailing  ")).toDF("doc_id", "text")
    val native = tricky.select($"doc_id",
      graft.functions.TextHash.shingles($"text", 3).as("s"))
    val hof = tricky.select($"doc_id",
      TextAnalysis.shingles($"text", 3).as("s"))
    assert(native.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      == hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap)
  }

  test("clusters: transitive pairs collapse to one min-labeled component") {
    // a~b, b~c chain plus an isolated d~e pair: two components, labels are
    // the component minima — the pairs list alone would over-delete b AND c
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("clusters converge on a long chain (diameter > 1 round)") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(chain).collect().map(_.getLong(1)).distinct
    assert(got.toSeq == Seq(1L))
    // the distributed fallback (forced via driverLimit=0) agrees exactly
    val dist = Dedup.clusters(chain, driverLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Dedup.clusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("clusters keep native string ids; driver and distributed schemas agree") {
    // '01' and '1' are distinct docs — a long cast would merge them (or
    // NPE); both paths must keep the string type and agree exactly
    val pairs = Seq(("01", "1"), ("1", "zz")).toDF("doc_a", "doc_b")
    val driver = Dedup.clusters(pairs)
    val dist = Dedup.clusters(pairs, driverLimit = 0)
    assert(driver.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(driver.schema == dist.schema)
    val got = driver.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("01" -> "01", "1" -> "01", "zz" -> "01"))
    assert(got == dist.collect().map(r => r.getString(0) -> r.getString(1)).toMap)
  }

  test("twoStage: exact copies collapse before the near-dup stage") {
    // 1 and 2 are exact copies; 3 is a near dup of 1 chosen to share an
    // LSH band with it (md5 minhashes are deterministic, so the collision
    // is stable). Only 1 survives the exact stage, so the result is the
    // single pair (1, 3) with copies_a = 2 — and the (1,2)/(2,3) pairs a
    // plain MinHash run would emit must NOT appear.
    val base = "the quick brown fox jumps over the lazy dog and runs " +
      "far away into the green forest tonight"
    val twoDocs = Seq(
      (1L, base),
      (2L, base), // exact copy of 1
      (3L, base.replaceFirst("the", "red")), // near dup, band-collides
      (4L, "completely different words entirely here now ok"))
      .toDF("doc_id", "text")
    val got = Dedup.twoStage(twoDocs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("copies_a"), r.getAs[Long]("copies_b"))).toSeq
    assert(got == Seq((1L, 3L, 2L, 1L)))
  }

  test("incrementalDedup: exact beats near, smallest history id wins, keep otherwise") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (4L, "the quick brown fox jumps over the lazy dog"), // same text, higher id
      (2L, "completely different words entirely here now ok"),
      (5L, "unrelated history content about nothing in particular at all"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // fingerprint normalization: extra whitespace still matches exactly
      (10L, "the quick  brown fox jumps over the lazy dog"),
      (11L, "completely different words entirely here now yes"), // near of 2
      (12L, "a brand new document sharing nothing with the history corpus"))
      .toDF("doc_id", "text")
    def run(h: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalDedup(h, b, "doc_id", "text",
        n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("verdict"), Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val got = run(history, batch)
    assert(got.size == 3)
    // exact: the SMALLEST matching history id, no jaccard
    assert(got(10L) == (("exact", Some(1L), None)))
    val (v11, m11, j11) = got(11L)
    assert(v11 == "near" && m11.contains(2L) && j11.exists(_ >= 0.5))
    assert(got(12L) == (("keep", None, None)))
    // partition-invariant
    assert(run(history.repartition(7), batch.repartition(3)) == got)
  }

  test("incrementalDedup is asymmetric: history and in-batch pairs never flag") {
    // two history docs near-dup EACH OTHER, and two batch docs near-dup
    // each other — neither pairing is this operator's business: verdicts
    // only relate batch docs to history
    val history = Seq(
      (1L, "shared history boilerplate sentence with many common words"),
      (2L, "shared history boilerplate sentence with many common terms"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "novel batch content first variant of the same new idea here"),
      (11L, "novel batch content second variant of the same new idea here"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(history, batch, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict"))
      .toMap
    assert(got == Map(10L -> "keep", 11L -> "keep"))
  }

  test("ledger-fed screen == recompute; params guarded; ingest partitions append") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different historical content about spark plans"),
      (3L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),   // exact
      (11L, "the quick brown fox jumps over the lazy dog tonight"), // near
      (12L, "a genuinely novel document unlike anything in history"),
      (13L, "")) // shingle-less
      .toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))
    val dir = java.nio.file.Files.createTempDirectory("ledger").toString
    DedupLedger.write(history, "doc_id", "text", n = 3, numHashes = 8,
      rowsPerBand = 2, path = dir, ingest = "day0", overwrite = true)
    val (fp, bands) = DedupLedger.read(spark, dir, 3, 8, 2)
    val ledgered = Dedup.incrementalDedupLedgered(history, fp, bands, batch,
      "doc_id", "text", 3, 8, 2, 0.5).collect().map(key).sortBy(_._1).toSeq
    val recomputed = Dedup.incrementalDedup(history, batch,
      "doc_id", "text", 3, 8, 2, 0.5).collect().map(key).sortBy(_._1).toSeq
    assert(ledgered == recomputed)
    assert(ledgered.map(r => r._1 -> r._2).toMap ==
      Map(10L -> "exact", 11L -> "near", 12L -> "keep", 13L -> "keep"))
    // appends add an ingest partition; reads see both days
    val day1 = Seq((20L, "a genuinely novel document unlike anything in history"))
      .toDF("doc_id", "text")
    DedupLedger.write(day1, "doc_id", "text", 3, 8, 2, dir, ingest = "day1")
    val (fp2, bands2) = DedupLedger.read(spark, dir, 3, 8, 2)
    assert(fp2.count() == 4 && fp2.filter($"doc_id" === 20L).count() == 1)
    assert(bands2.filter($"doc_id" === 20L).count() == 4) // 8 hashes / 2
    // ...and partition pruning is available on the ingest label
    val pruned = spark.read.parquet(s"$dir/fp").filter($"ingest" === "day1")
    assert(pruned.count() == 1)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(ingest"))
    // a ledger built with other LSH parameters refuses both read + append
    intercept[IllegalArgumentException] { DedupLedger.read(spark, dir, 4, 8, 2) }
    intercept[IllegalArgumentException] {
      DedupLedger.write(day1, "doc_id", "text", 3, 16, 4, dir, ingest = "day2")
    }
  }

  test("minhashLsh candidates recover the exact dup pair") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      n = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L))) // identical signatures share every band
  }

  test("native minhash expression matches the relational signature build bit-for-bit") {
    val extra = Seq(
      (5L, "  leading and \t trailing whitespace  "),
      (6L, "unicode tokens 你好 世界 mixed in here ok"),
      (7L, "x y"), // fewer tokens than n -> no signature
      (8L, "a b a b a b a b") // duplicate shingles -> same min
    ).toDF("doc_id", "text")
    val all = docs.union(extra)
    val numHashes = 8
    val native = all.select($"doc_id",
      graft.functions.TextHash.minhash($"text", 3, numHashes).as("mh"))
      .filter($"mh".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val relational = Dedup.minhashSignatures(
        Dedup.docShingles(all, "doc_id", "text", 3), numHashes)
      .collect().map(r => r.getLong(0) ->
        (1 to numHashes).map(i => r.getString(i)).toList).toMap
    assert(native == relational)
    assert(!native.contains(7L))
  }

  test("double-hashed minhash matches DuckDB md5_number semantics (pinned vectors)") {
    // expected values recomputed independently: h_j = (lower64 + j*upper64)
    // mod 2^64 with lower/upper = little-endian uint64 halves of
    // md5(shingle) — DuckDB's md5_number_lower/md5_number_upper, verified
    // against duckdb 1.0.0 on these exact inputs
    val r = Seq((1L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.TextHash.minhashU64($"text", 3, 4).as("mh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1).toList).toMap
    assert(r(1L) == List("2456462632627010471", "12222221311869971373",
      "3541235917403380659", "12756074632434801459"))
    assert(r(2L) == List("2456462632627010471", "12222221311869971373",
      "3541235917403380659", "13306994596646341561"))
  }

  test("double-hashed minhash matches a plain-Scala reference on edge cases") {
    def ref(text: String, n: Int, k: Int): Option[List[String]] = {
      val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      if (toks.length < n) return None
      val md = java.security.MessageDigest.getInstance("MD5")
      val sh = toks.sliding(n).map(_.mkString(" ")).toList
      val mins = Array.fill(k)(null: java.math.BigInteger)
      val mod = java.math.BigInteger.ONE.shiftLeft(64)
      sh.foreach { s =>
        md.reset()
        val d = md.digest(s.getBytes("UTF-8"))
        def le(off: Int) = new java.math.BigInteger(1,
          (off until off + 8).map(d(_)).reverse.toArray)
        val (h1, h2) = (le(8), le(0))
        (0 until k).foreach { j =>
          val v = h1.add(h2.multiply(java.math.BigInteger.valueOf(j))).mod(mod)
          if (mins(j) == null || v.compareTo(mins(j)) < 0) mins(j) = v
        }
      }
      Some(mins.map(_.toString).toList)
    }
    val texts = Seq(
      (5L, "  leading and \t trailing whitespace  "),
      (6L, "unicode tokens 你好 世界 mixed in here ok"),
      (7L, "x y"), // fewer tokens than n -> null
      (8L, "a b a b a b a b")) // duplicate shingles -> same min
    val native = texts.toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.TextHash.minhashU64($"text", 3, 8).as("mh"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[String](1).toList))).toMap
    texts.foreach { case (id, t) => assert(native(id) == ref(t, 3, 8), s"doc $id") }
  }

  test("simhash pairs: identical docs at hamming 0, distant docs not paired") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact dups 1/2 collide in every band at distance 0
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    // the unrelated doc 4 pairs with nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // every emitted pair respects the cap
    assert(pairs.forall(_._3 <= 3))
  }

  test("contact signals count and redact emails, urls, digit runs") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-1.org or see https://x.io/p?q=1 call 12345678"),
      (2L, "nothing to see here 123")).toDF("doc_id", "text")
    val sig = df.select($"doc_id",
      TextAnalysis.contactSignals($"text").as("s"))
      .select($"doc_id", $"s.n_emails", $"s.n_urls", $"s.n_long_digit_runs")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(sig(1L) == ((1, 1, 1)))
    assert(sig(2L) == ((0, 0, 0)))
    val red = df.filter($"doc_id" === 1L)
      .select(TextAnalysis.redactContacts($"text").as("t"))
      .collect()(0).getString(0)
    assert(red == "mail me at <REDACTED> or see <REDACTED> call <REDACTED>")
  }

  test("repetition score: distinct-over-total n-grams, short docs zero") {
    val df = Seq(
      (1L, "a b c a b c a b c"),   // 7 trigrams, 3 distinct -> 4/7
      (2L, "all distinct words here now"), // no repeats -> 0
      (3L, "x y")                  // shorter than n -> 0
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextAnalysis.repetitionScore($"text", 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == BigDecimal(4.0 / 7.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
  }

  test("simhash: identical docs identical hashes, 16 hex chars") {
    val h = Dedup.simhashHex(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L) == h(2L))
    assert(h.values.forall(v => v.length == 16 && v.matches("[0-9a-f]{16}")))
    assert(h(1L) != h(4L))
  }

  test("simhash native expression matches the relational form bit-for-bit") {
    val extra = Seq(
      (5L, "  leading and \t trailing whitespace  "),
      (6L, "unicode tokens 你好 世界 mixed in"),
      (7L, "repeated repeated repeated words words tilt the votes")
    ).toDF("doc_id", "text")
    val all = docs.union(extra)
    val native = Dedup.simhashHex(all, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val relational = Dedup.simhashHexRelational(all, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native == relational)
    // token-less text yields no row in either form
    val empty = Seq((8L, "   ")).toDF("doc_id", "text")
    assert(Dedup.simhashHex(empty, "doc_id", "text").count() == 0)
  }

  test("urlDedup: scheme/www/fragment/tracking variants collapse, real queries survive") {
    val d = Seq(
      (1L, "https://Example.com/a"),
      (2L, "http://www.example.com/a/"),
      (3L, "https://example.com/a#frag"),
      (4L, "https://example.com/a?utm_source=x&utm_medium=y"),
      (5L, "https://example.com/a?id=3"), // REAL query param: distinct page
      (6L, "https://example.com/b")).toDF("doc_id", "url")
    val out = Dedup.urlDedup(d, "doc_id", "url")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))).toMap
    assert(out("example.com/a") == ((1L, 4L)))
    assert(out("example.com/a?id=3") == ((5L, 1L)))
    assert(out("example.com/b") == ((6L, 1L)))
  }

  test("gopherFlags: rule columns exact, conjunction flags short/symbol docs") {
    val d = Seq(
      (1L, "the cat sat of and to in is it on the mat here now ok"), // passes
      (2L, "too short"),                                            // n_words
      (3L, "#### @@@@ ~~~~ the cat sat on a mat in a hat today")    // symbols
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(d, "text", minWords = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("passes"))
    assert(!out(2L).getAs[Boolean]("passes") &&
      out(2L).getAs[Long]("n_words") == 2L)
    val r3 = out(3L)
    assert(!r3.getAs[Boolean]("passes"))
    assert(r3.getAs[Double]("symbol_ratio") > 0.1)
    // exact ratio check on doc 1: 15 words, 8 en-stopword hits
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 15L)
    assert(r1.getAs[Double]("stopword_frac") ==
      BigDecimal(8.0 / 15.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("htmlToText: blocks whole, tags structure lines, entities decode, malformed degrades") {
    import graft.operators.TextAnalysis
    def ext(h: String): String =
      Seq(Tuple1(h)).toDF("h")
        .select(TextAnalysis.htmlToText($"h")).collect()(0).getString(0)
    // script/style content vanishes even with < > inside; comment too
    assert(ext("<head><style>p{x:1}</style><script>if(1<2){a()}</script>" +
      "</head><body><!-- note --><p>real text</p></body>") == "real text")
    // structuring tags break lines; inline tags just space
    assert(ext("<h1>Title</h1><p>one <b>bold</b> word</p><li>item</li>") ==
      "Title\none bold word\nitem")
    // entities, &amp; decoded last so &amp;lt; stays literal
    assert(ext("a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;amp; &amp;lt;") ==
      "a b <tag> \"q\" 's' &amp; &lt;")
    // malformed: unclosed tag eats to the next '>', stray '<' survives
    assert(ext("before <unclosed attr after>middle< end") == "before middle< end")
    // whitespace discipline: runs collapse, blank lines drop
    assert(ext("<p>a   b</p>\n\n<p>   </p><p>c</p>") == "a b\nc")
  }

  test("c4Flags: line rules exact — terminal/short fracs, curly, lorem, js") {
    val d = Seq(
      (1L, "A clean page begins here.\nIt has a second sentence!\n" +
        "And a third one ends with a question?"),           // passes
      (2L, "no punctuation on this line\nNor on this one"),  // terminal 0
      (3L, "A sentence that ends fine.\nok\n\n  \nAnother fine sentence."),
      (4L, "Some page with code.\nif (x) { return; }\nMore prose here."),
      (5L, "Lorem Ipsum dolor sit amet.\nA real sentence follows it."),
      (6L, "Please enable JavaScript to view.\nActual content lives here."),
      (7L, "")                                               // empty page
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Flags(d, "text", minLines = 2,
        minTerminalFrac = 0.5, maxShortFrac = 0.4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("passes"))
    assert(out(1L).getAs[Long]("n_lines") == 3L)
    assert(out(1L).getAs[Double]("terminal_line_frac") == 1.0)
    assert(!out(2L).getAs[Boolean]("passes") &&
      out(2L).getAs[Double]("terminal_line_frac") == 0.0)
    // blank/whitespace lines drop before any ratio; "ok" is a short line
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_lines") == 3L)
    assert(r3.getAs[Double]("short_line_frac") ==
      BigDecimal(1.0 / 3.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!out(4L).getAs[Boolean]("passes") &&
      out(4L).getAs[Boolean]("has_curly"))
    assert(!out(5L).getAs[Boolean]("passes") &&
      out(5L).getAs[Boolean]("has_lorem"))
    assert(!out(6L).getAs[Boolean]("passes") &&
      out(6L).getAs[Long]("n_js_lines") == 1L)
    assert(!out(7L).getAs[Boolean]("passes") &&
      out(7L).getAs[Long]("n_lines") == 0L)
  }

  test("segmentDedup: repeated segments survive only in the owner doc") {
    // 2-token segments; 'a b' and 'c d' repeat across docs, 'x y' unique
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d"))) // owner of both segments
    assert(out(2L) == ((2L, 1L, "x y")))     // 'a b' cut, own tail kept
    assert(out(3L) == ((1L, 1L, "")))        // fully deduplicated
  }

  test("segmentDedup: partial tail segment, within-doc repeats kept in owner") {
    val d = Seq(
      (1L, "p q p q p"), // segments: 'p q', 'p q', 'p' — all owned by 1
      (2L, "p q")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    // the owner keeps BOTH its occurrences (cross-doc dedup, not within-doc)
    assert(out(1L) == ((3L, 0L, "p q p q p")))
    assert(out(2L) == ((1L, 1L, "")))
    // token-less docs have no segments and are absent
    val empty = Seq((9L, "  ")).toDF("doc_id", "text")
    assert(Dedup.segmentDedup(empty, "doc_id", "text", 2).count() == 0)
  }

  test("cdcSegmentDedup: content-defined boundaries survive the insertion shift fixed stride misses") {
    // 'mark' is a cut token at avgSegTokens = 12 (md5 32-bit % 12 == 0);
    // doc 2 prepends ONE token, the shift that de-aligns every fixed
    // stride — the CDC boundary re-synchronizes at 'mark' and the shared
    // tail segment dedups
    val d = Seq(
      (1L, "mark alpha beta gamma"),
      (2L, "zeta mark alpha beta gamma")).toDF("doc_id", "text")
    val cdc = Dedup.cdcSegmentDedup(d, "doc_id", "text", avgSegTokens = 12)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(cdc(1L) == ((2L, 0L, "mark alpha beta gamma")), cdc.toString)
    assert(cdc(2L) == ((2L, 1L, "zeta mark")), cdc.toString)
    // the fixed-stride twin misses it entirely (documented blind spot)
    val fixed = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_removed")).toMap
    assert(fixed(2L) == 0L, s"stride-2 unexpectedly dedup'd: $fixed")
  }

  test("removeBoilerplateLines: >= minDocFreq distinct docs drops ALL copies, order kept") {
    val d = Seq(
      (1L, "unique one\nAccept Cookies\nbody a"),
      (2L, "accept cookies\nbody b\n\nunique two"),  // case-insensitive match
      (3L, "ACCEPT COOKIES \nbody a\nbody a"),        // trailing space trims
      (4L, "body a")).toDF("doc_id", "text")
    // 'accept cookies' in 3 distinct docs -> boilerplate at minDocFreq 3;
    // 'body a' in 3 distinct docs too (doc 3 counts ONCE) -> boilerplate;
    // blank lines never count and always survive
    val out = graft.operators.TextAnalysis
      .removeBoilerplateLines(d, "doc_id", "text", minDocFreq = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Long]("kept_lines"),
          r.getAs[Long]("dropped_lines")))).toMap
    assert(out(1L) == (("unique one", 1L, 2L)))
    assert(out(2L) == (("body b\n\nunique two", 3L, 1L)), out(2L).toString)
    assert(out(3L) == (("", 0L, 3L)))
    assert(out(4L) == (("", 0L, 1L)))
    // at minDocFreq 4 nothing is frequent enough: everything survives
    val loose = graft.operators.TextAnalysis
      .removeBoilerplateLines(d, "doc_id", "text", minDocFreq = 4L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("dropped_lines")).toMap
    assert(loose.values.forall(_ == 0L))
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.removeBoilerplateLines(d, "doc_id", "text", 1L)
    }
  }

  test("winnowing: deque selection == naive rightmost-min windows on random docs") {
    // independent naive reference: per-window scan instead of the deque
    def le64(d: Array[Byte]): Long = {
      var v = 0L; var i = 15
      while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
      v
    }
    def naive(text: String, k: Int, w: Int): Seq[(Long, String)] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) return Seq.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to toks.length - k).map(i =>
        le64(md.digest(toks.slice(i, i + k).mkString(" ").getBytes("UTF-8"))))
      val effW = math.min(w, hs.length)
      val sel = scala.collection.mutable.LinkedHashSet.empty[Int]
      for (j <- 0 to hs.length - effW) {
        var best = j
        for (i <- j until j + effW)
          if (java.lang.Long.compareUnsigned(hs(i), hs(best)) <= 0) best = i
        sel += best
      }
      sel.toSeq.sorted.map(p =>
        ((p + 1).toLong, java.lang.Long.toUnsignedString(hs(p))))
    }
    val rnd = new scala.util.Random(20260815L)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (1L to 40L).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val out = graft.operators.TextAnalysis
      .winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
    docs.foreach { case (id, text) =>
      val want = naive(text, 3, 4)
      val got = out.getOrElse(id, Seq.empty)
      assert(got == want, s"doc $id: got $got want $want (text='$text')")
    }
    // the winnowing guarantee: a shared run of >= k + w - 1 tokens yields
    // at least one shared fingerprint
    val run = "one two three four five six seven eight"
    val d2 = Seq((1L, s"prefix junk $run"), (2L, s"$run trailing other words"))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextAnalysis
      .winnowFingerprints(d2, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2))
    val shared = fps.filter(_._1 == 1L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.nonEmpty, "shared 8-token run produced no common fingerprint")
  }

  test("winnowingPairs: shared-run docs pair, unrelated do not, threshold filters") {
    val run = "the quick brown fox jumps over the lazy dog again today"
    val d = Seq(
      (1L, s"$run plus unique tail one"),
      (2L, s"different head text then $run"),
      (3L, "completely unrelated content about spark physical plans"),
      (4L, "ab")).toDF("doc_id", "text") // < k tokens -> no fingerprints
    val pairs = graft.operators.Dedup
      .winnowingPairs(d, "doc_id", "text", k = 3, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), pairs.toString)
    assert(pairs((1L, 2L)) >= 1L)
    // a high threshold filters the pair out
    val strict = graft.operators.Dedup
      .winnowingPairs(d, "doc_id", "text", k = 3, w = 4,
        minShared = pairs((1L, 2L)) + 1)
      .collect()
    assert(strict.isEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.winnowingPairs(d, "doc_id", "text", 3, 4, 0L)
    }
    // span-level evidence: every match names a fingerprint BOTH docs
    // selected, at positions whose k-grams are literally equal
    val matches = graft.operators.Dedup
      .winnowingMatches(d, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(matches.nonEmpty)
    assert(matches.forall(m => m._1 == 1L && m._3 == 2L))
    val toks1 = (run + " plus unique tail one").split("\\s+")
    val toks2 = ("different head text then " + run).split("\\s+")
    matches.foreach { case (_, pa, _, pb, _) =>
      val ga = toks1.slice(pa.toInt - 1, pa.toInt + 2).mkString(" ")
      val gb = toks2.slice(pb.toInt - 1, pb.toInt + 2).mkString(" ")
      assert(ga == gb, s"positions ($pa, $pb) name different 3-grams: '$ga' vs '$gb'")
    }
    // distinct shared fps == the pair's n_shared
    assert(matches.map(_._5).distinct.length == pairs((1L, 2L)).toInt)
  }

  test("corpusDiff: four statuses; whitespace-only rewrites are unchanged") {
    val oldSnap = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept as is"))
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "  alpha\tbeta "),     // whitespace-only rewrite -> unchanged
      (2L, "gamma delta revised"), // changed
      (4L, "brand new doc"))       // added; 3 removed
      .toDF("doc_id", "text")
    val d = graft.operators.Dedup.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), d.toString)
  }

  test("winnowingMatchesAgainst: persisted history fps, batch-vs-history only") {
    import graft.operators.{Dedup, TextAnalysis}
    val run = "the quick brown fox jumps over the lazy dog again today"
    val history = Seq(
      (100L, s"$run stored in the corpus last week"),
      (101L, s"another kept doc also containing $run"),
      (102L, "history content sharing nothing with the batch")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"fresh submission that repeats $run verbatim"),
      (2L, "novel batch document with entirely distinct words"),
      (3L, s"fresh submission that repeats $run verbatim")) // dup WITHIN batch
      .toDF("doc_id", "text")
    // the build/consume split: persist the history fingerprints, re-read
    val dir = java.nio.file.Files.createTempDirectory("winnow-ledger").toString
    TextAnalysis.winnowFingerprints(history, "doc_id", "text", 5, 4)
      .write.mode("overwrite").parquet(dir)
    val ev = Dedup.winnowingMatchesAgainst(spark.read.parquet(dir), batch,
        "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(ev.nonEmpty)
    // only batch-vs-history rows: batch ids 1/3 against history 100/101;
    // batch-internal dup (1 vs 3) and history-history never appear
    assert(ev.forall(e => Set(1L, 3L).contains(e._1) &&
      Set(100L, 101L).contains(e._3)), ev.mkString("\n"))
    assert(ev.exists(_._1 == 1L) && ev.exists(_._1 == 3L))
    assert(!ev.exists(_._1 == 2L))
    // every evidence row names a literally equal 5-gram on both sides
    val texts = (history.collect() ++ batch.collect())
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+")).toMap
    ev.foreach { case (b, pb, h, ph, _) =>
      val gb = texts(b).slice(pb.toInt - 1, pb.toInt + 4).mkString(" ")
      val gh = texts(h).slice(ph.toInt - 1, ph.toInt + 4).mkString(" ")
      assert(gb == gh, s"($b:$pb, $h:$ph): '$gb' vs '$gh'")
    }
    // persisted-vs-recomputed history fps yield identical evidence
    val ev2 = Dedup.winnowingMatchesAgainst(
        TextAnalysis.winnowFingerprints(history, "doc_id", "text", 5, 4),
        batch, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(ev.sorted.toSeq == ev2.sorted.toSeq)
  }

  test("dedupLinesWithinDoc: first occurrence survives, norm matching, blanks kept") {
    val d = Seq(
      (1L, "alpha\nNav | Bar\nnav | bar \nalpha\n\n\nbeta"),
      (2L, "only one line"),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .dedupLinesWithinDoc(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"))))
      .toMap
    // case/space variants dedup; the repeated body drops; BOTH blanks stay
    assert(out(1L) == (("alpha\nNav | Bar\n\n\nbeta", 7L, 2L)), out(1L).toString)
    assert(out(2L) == (("only one line", 1L, 0L)))
    assert(out(3L) == (("", 1L, 0L)))
  }

  test("boilerplate dictionary: persisted build + apply == one-shot removal") {
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "unique one\nAccept Cookies\nbody a"),
      (2L, "accept cookies\nbody b\n\nunique two"),
      (3L, "ACCEPT COOKIES \nbody a\nbody a"),
      (4L, "body a")).toDF("doc_id", "text")
    // the dictionary alone: normalized lines in >= 3 distinct docs
    val dict = TextAnalysis.boilerplateDictionary(d, "doc_id", "text", 3L)
    assert(dict.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("accept cookies", "body a"))
    // production shape: persist the dictionary, re-read, apply to a batch
    val dir = java.nio.file.Files.createTempDirectory("bp-dict").toString
    dict.write.mode("overwrite").parquet(dir)
    val applied = TextAnalysis.applyBoilerplateDictionary(
        d, "doc_id", "text", spark.read.parquet(dir))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Long]("kept_lines"),
          r.getAs[Long]("dropped_lines")))).toMap
    val oneShot = TextAnalysis
      .removeBoilerplateLines(d, "doc_id", "text", minDocFreq = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Long]("kept_lines"),
          r.getAs[Long]("dropped_lines")))).toMap
    assert(applied == oneShot, s"$applied vs $oneShot")
    // the consume half against YESTERDAY's dictionary on a NEW batch:
    // only dictionary lines drop — no re-counting of the new batch
    // ('fresh line' appears twice in the new batch but is NOT in the dict)
    val newBatch = Seq(
      (10L, "fresh line\naccept cookies\nkept text"),
      (11L, "fresh line\nbody a")).toDF("doc_id", "text")
    val screened = TextAnalysis.applyBoilerplateDictionary(
        newBatch, "doc_id", "text", spark.read.parquet(dir))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(screened(10L) == "fresh line\nkept text")
    assert(screened(11L) == "fresh line")
  }
}

class TermStatsSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs; 'shared' in all, 'pair' in two, 'only' in one
  private val docs = Seq(
    (1L, "shared pair only only"),
    (2L, "shared pair"),
    (3L, "shared")).toDF("doc_id", "text")

  test("tfidf: rare terms outscore common ones, smoothed idf formula exact") {
    val out = TermStats.tfidfTopTerms(docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf"),
          r.getAs[Long]("rank")))).toMap
    def score(tf: Long, df: Long): Double =
      BigDecimal(tf * (math.log(4.0 / (df + 1.0)) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, "only")) == ((2L, 1L, score(2, 1), 1L)))
    assert(out((1L, "pair")) == ((1L, 2L, score(1, 2), 2L)))
    // df = N: ln((N+1)/(N+1)) + 1 = 1 -> tfidf = tf
    assert(out((3L, "shared")) == ((1L, 3L, 1.0, 1L)))
    // rank within doc 1: only > pair > shared
    assert(out((1L, "shared"))._4 == 3L)
  }

  test("bm25: rank ordering matches tfidf intuition, dl/avgdl normalization") {
    val rows = TermStats.bm25TopTerms(docs, "doc_id", "text", k = 5).collect()
    val doc1 = rows.filter(_.getLong(0) == 1L)
      .sortBy(_.getAs[Long]("rank")).map(_.getString(1)).toSeq
    assert(doc1 == Seq("only", "pair", "shared"))
    // exact formula for doc 3's 'shared': tf=1, df=3, dl=1, avgdl=7/3
    val r3 = rows.find(r => r.getLong(0) == 3L && r.getString(1) == "shared").get
    val idf = math.log(1.0 + (3 - 3 + 0.5) / (3 + 0.5))
    val expected = BigDecimal(idf * 1.0 * 2.2 /
        (1.0 + 1.2 * (1.0 - 0.75 + 0.75 * 1.0 / (7.0 / 3.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r3.getAs[Double]("bm25") == expected)
    assert(r3.getAs[Long]("dl") == 1L)
  }

  test("unigram perplexity: exact micro-bit NLLs, rare-token docs score higher") {
    // corpus: T = 7 tokens, V = 3 terms; P(t) = (cnt+1)/(T+V) = (cnt+1)/10
    val out = TermStats.unigramLogLoss(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("dl"), r.getAs[Long]("nll_micro"),
          r.getAs[Double]("cross_entropy"), r.getAs[Double]("perplexity")))).toMap
    def nll(cnt: Long): Long =
      BigDecimal(-math.log((cnt + 1.0) / 10.0) / math.log(2.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val nShared = nll(3) // cnt(shared)=3
    val nPair = nll(2)
    val nOnly = nll(2)   // cnt(only)=2 (twice in doc 1)
    def ce(sum: Long, dl: Long): Double =
      BigDecimal(sum.toDouble / dl)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 1000000.0
    def ppl(c: Double): Double =
      BigDecimal(math.pow(2.0, c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sum1 = nShared + nPair + 2 * nOnly
    assert(out(1L) == ((4L, sum1, ce(sum1, 4), ppl(ce(sum1, 4)))))
    val sum3 = nShared
    assert(out(3L) == ((1L, sum3, ce(sum3, 1), ppl(ce(sum3, 1)))))
    // doc 3 is all stop-word: lowest cross-entropy of the three
    assert(out(3L)._3 < out(2L)._3 && out(2L)._3 <= out(1L)._3)
  }

  test("dsir: weights match a driver-side exact recompute; LLR gate sane") {
    val corpus = Seq(
      (1L, "the quick brown fox", true),
      (2L, "the quick quick fox", true),
      (3L, "zzz qqq xxx", false),
      (4L, "the quick brown fox", false),
      (5L, "  ", false))
    // buckets=16: with the default 1024 the Laplace denominators swamp a
    // 26-token toy corpus and every weight is negative by construction
    val out = TermStats.dsirWeights(
      corpus.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"),
      buckets = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("logw_micro"),
          r.getAs[Boolean]("keep")))).toMap
    // exact recompute: same features, same md5 buckets, same micro-bit
    // rounding — any engine drift fails the equality below
    def feats(text: String): Seq[String] = {
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(f: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % 16
    }
    val docFeats = corpus.map { case (id, text, tgt) =>
      (id, feats(text).map(bucket), tgt) }
    val cntRaw = docFeats.flatMap(_._2).groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val cntTgt = docFeats.filter(_._3).flatMap(_._2).groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val tRaw = cntRaw.values.sum
    val tTgt = cntTgt.values.sum
    def lpMicro(c: Long, t: Long): Long =
      BigDecimal(math.log((c + 1.0) / (t + 16.0)) / math.log(2.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def delta(b: Int): Long =
      lpMicro(cntTgt.getOrElse(b, 0L), tTgt) - lpMicro(cntRaw(b), tRaw)
    docFeats.filter(_._2.nonEmpty).foreach { case (id, bs, _) =>
      val w = bs.map(delta).sum
      assert(out(id) == ((bs.size.toLong, w, w > 0L)), s"doc $id")
    }
    // whitespace-only doc has no features and drops out
    assert(!out.contains(5L))
    // identical text scores identically whether or not it is in the target
    assert(out(4L)._2 == out(1L)._2)
    // LLR ordering: in-distribution text above off-distribution; the gate
    // fires for at least one target-like doc
    assert(out(4L)._2 > out(3L)._2)
    assert(out(2L)._3 && !out(3L)._3)
  }

  test("dsir model is dense: unseen-in-training buckets score the smoothed delta") {
    val corpus = Seq((1L, "alpha beta", true), (2L, "gamma", false))
    val buckets = 64
    def bucket(f: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % buckets
    }
    val trainFeats = Seq("alpha", "beta", "alpha beta", "gamma")
    val trained = trainFeats.map(bucket).toSet
    // a single-token probe whose bucket no training feature hashed to
    val probeWord = (0 until 10000).map(i => s"w$i")
      .find(w => !trained.contains(bucket(w))).get
    val model = TermStats.dsirModel(
      corpus.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"),
      buckets = buckets)
    assert(model.count() == buckets.toLong, "model must cover every bucket")
    val scored = TermStats.dsirScore(
      Seq((99L, probeWord)).toDF("doc_id", "text"), "doc_id", "text",
      model, buckets = buckets)
      .collect().head
    // tRaw = 4 train features, tTgt = 3; unseen delta = lp(0,3)-lp(0,4)
    def lpMicro(c: Long, t: Long): Long =
      BigDecimal(math.log((c + 1.0) / (t + buckets.toDouble)) / math.log(2.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = lpMicro(0L, 3L) - lpMicro(0L, 4L)
    assert(scored.getAs[Long]("n_feats") == 1L, "unseen feature must not drop")
    assert(scored.getAs[Long]("logw_micro") == want)
  }

  test("stupid backoff: seen bigrams use c_bi/c_prev, unseen back off; exact") {
    val corpus = Seq(
      (1L, "a b a b c", true),
      (2L, "a b x", false),
      (3L, "c a", true),
      (4L, "z", false),
      (5L, "  ", false))
    val out = TermStats.stupidBackoffScore(
      corpus.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_backoff"),
          r.getAs[Long]("nll_micro")))).toMap
    // model over docs 1+3: uni a=3 b=2 c=2 (T=7, V=3);
    // bi (a,b)=2 (b,a)=1 (b,c)=1 (c,a)=1
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def seenNll(cBi: Long, cPrev: Long): Long =
      micro(-math.log(cBi.toDouble / cPrev) / math.log(2.0))
    def backNll(cNext: Long): Long =
      micro(-math.log(0.4 * ((cNext + 1.0) / 11.0)) / math.log(2.0))
    // doc 1: (a,b) (b,a) (a,b) (b,c) — all seen
    val d1 = 2 * seenNll(2, 3) + seenNll(1, 2) + seenNll(1, 2)
    assert(out(1L) == ((4L, 0L, d1)))
    // doc 2: (a,b) seen; (b,x) unseen, x fully OOV
    val d2 = seenNll(2, 3) + backNll(0)
    assert(out(2L) == ((2L, 1L, d2)))
    // doc 3: (c,a) seen
    assert(out(3L) == ((1L, 0L, seenNll(1, 2))))
    // single-token and whitespace-only docs have no bigram positions
    assert(!out.contains(4L) && !out.contains(5L))
  }
}

class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    (1L, 100L, 10L, 1.0),
    (1L, 200L, 11L, 2.0),
    (1L, 200L, 12L, 3.0), // tie at ts=200: event 12 wins (greater id)
    (2L, 500L, 20L, 5.0)).toDF("user_id", "ts", "event_id", "value")
  private val left = Seq(
    (1L, 150L, 900L),  // between 100 and 200 -> match 10
    (1L, 200L, 901L),  // AT 200 -> equal-ts match, tie to 12
    (1L, 999L, 902L),  // after all -> 12
    (2L, 499L, 903L),  // before any -> no match
    (3L, 100L, 904L))  // key with no right side -> no match
    .toDF("user_id", "ts", "event_id")

  // every contract assertion runs in BOTH forms: the per-key window and
  // the skew-proof time-chunked two-pass (width 100 splits the fixture's
  // ts range into several chunks, incl. chunks with only left rows)
  private val modes: Seq[(String, Option[Long])] =
    Seq("keyed" -> None, "chunked" -> Some(100L))

  test("asof backward: most-recent-at-or-before, deterministic ties, null misses") {
    for ((mode, cw) <- modes) {
      val out = TimeJoins.asofBackward(left, right, Seq("user_id"), "ts", "ts",
          rightPrefix = "r_", chunkWidth = cw)
        .collect().map(r => r.getAs[Long]("event_id") ->
          ((Option(r.getAs[java.lang.Long]("r_event_id")),
            Option(r.getAs[java.lang.Double]("r_value"))))).toMap
      assert(out(900L) == ((Some(10L), Some(1.0))), mode)
      assert(out(901L) == ((Some(12L), Some(3.0))), mode)
      assert(out(902L) == ((Some(12L), Some(3.0))), mode)   // carry across chunks
      assert(out(903L) == ((None, None)), mode)
      assert(out(904L) == ((None, None)), mode)
    }
  }

  test("asof backward: tolerance nulls out stale matches; repartition-invariant") {
    for ((mode, cw) <- modes) {
      val out = TimeJoins.asofBackward(left, right, Seq("user_id"), "ts", "ts",
          tolerance = Some(60L), rightPrefix = "r_", chunkWidth = cw)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("r_event_id"))).toMap
      assert(out(900L) == Some(10L), mode)   // gap 50 <= 60
      assert(out(901L) == Some(12L), mode)   // gap 0
      assert(out(902L) == None, mode)        // gap 799 > 60 (chunk-carried)
      val a = TimeJoins.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        chunkWidth = cw).collect().toSet
      val b = TimeJoins.asofBackward(left.repartition(5), right.repartition(3),
        Seq("user_id"), "ts", "ts", chunkWidth = cw).collect().toSet
      assert(a == b, mode)
    }
  }

  test("asof chunked == keyed on randomized data with a hot key and chunk gaps") {
    val rnd = new scala.util.Random(7)
    // 85% of rows on key 1 (the hot key), ts clustered so many chunks are
    // left-only or right-only; duplicate timestamps included
    def rows(n: Int, side: String) = (0 until n).map { i =>
      val k = if (rnd.nextInt(100) < 85) 1L else 1L + rnd.nextInt(4)
      val ts = rnd.nextInt(40) * 25L + rnd.nextInt(3) // duplicates + gaps
      (k, ts, i.toLong, s"$side$i")
    }
    val r = rows(400, "r").toDF("user_id", "ts", "event_id", "payload")
    val l = rows(400, "l").toDF("user_id", "ts", "event_id", "payload")
    val keyed = TimeJoins.asofBackward(l, r, Seq("user_id"), "ts", "ts")
      .collect().toSet
    for (w <- Seq(7L, 100L, 1000L)) {
      val chunked = TimeJoins.asofBackward(l, r, Seq("user_id"), "ts", "ts",
        chunkWidth = Some(w)).collect().toSet
      assert(chunked == keyed, s"chunkWidth=$w diverged from keyed")
    }
  }

  test("asof forward: earliest-at-or-after, tie to greatest payload, tolerance") {
    for ((mode, cw) <- modes) {
      val out = TimeJoins.asofForward(left, right, Seq("user_id"), "ts", "ts",
          rightPrefix = "n_", chunkWidth = cw)
        .collect().map(r => r.getAs[Long]("event_id") ->
          ((Option(r.getAs[java.lang.Long]("n_event_id")),
            Option(r.getAs[java.lang.Long]("n_ts"))))).toMap
      assert(out(900L) == ((Some(12L), Some(200L))), mode) // next at 200, tie->12
      assert(out(901L) == ((Some(12L), Some(200L))), mode) // AT 200 matches
      assert(out(902L) == ((None, None)), mode)            // nothing after 999
      assert(out(903L) == ((Some(20L), Some(500L))), mode) // next at 500
      assert(out(904L) == ((None, None)), mode)            // key without rights
      // tolerance: 903 (gap 1) survives a 1-tick budget, 900 (gap 50) not
      val tol = TimeJoins.asofForward(left, right, Seq("user_id"), "ts", "ts",
          tolerance = Some(1L), rightPrefix = "n_", chunkWidth = cw)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("n_event_id"))).toMap
      assert(tol(903L) == Some(20L) && tol(900L) == None, mode)
      // ts columns come back un-negated
      val lTs = TimeJoins.asofForward(left, right, Seq("user_id"), "ts", "ts",
          chunkWidth = cw)
        .collect().map(_.getAs[Long]("ts")).toSet
      assert(lTs == Set(150L, 200L, 999L, 499L, 100L), mode)
    }
  }

  test("asof nearest: min |gap|, tie to before, tolerance bounds the winner") {
    for ((mode, cw) <- modes) {
      val out = TimeJoins.asofNearest(left, right, Seq("user_id"), "ts", "ts",
          rightPrefix = "n_", chunkWidth = cw)
        .collect().map(r => r.getAs[Long]("event_id") ->
          ((Option(r.getAs[java.lang.Long]("n_event_id")),
            Option(r.getAs[String]("n_from"))))).toMap
      // 900 @150: before 100 (gap 50) vs after 200 (gap 50) -> tie -> before
      assert(out(900L) == ((Some(10L), Some("before"))), mode)
      // 901 @200: exact hit, gap 0 both ways -> before, tie-max 12
      assert(out(901L) == ((Some(12L), Some("before"))), mode)
      // 902 @999: nothing after, before 200 wins
      assert(out(902L) == ((Some(12L), Some("before"))), mode)
      // 903 @499: nothing before, after 500 (gap 1)
      assert(out(903L) == ((Some(20L), Some("after"))), mode)
      // 904: no right side at all
      assert(out(904L) == ((None, None)), mode)
      // tolerance 10: only 901 (0) and 903 (1) survive
      val tol = TimeJoins.asofNearest(left, right, Seq("user_id"), "ts", "ts",
          tolerance = Some(10L), rightPrefix = "n_", chunkWidth = cw)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("n_event_id"))).toMap
      assert(tol(901L) == Some(12L) && tol(903L) == Some(20L), mode)
      assert(tol(900L) == None && tol(902L) == None, mode)
      // exactly one output row per left row (no join fan-out)
      assert(TimeJoins.asofNearest(left, right, Seq("user_id"), "ts", "ts",
        chunkWidth = cw).count() == left.count(), mode)
    }
  }

  test("asof chunked: negative timestamps (div truncation) and equal-ts chunk edges") {
    val r = Seq((1L, -250L, 1L, 1.0), (1L, -100L, 2L, 2.0), (1L, 0L, 3L, 3.0),
      (1L, 100L, 4L, 4.0)).toDF("user_id", "ts", "event_id", "value")
    val l = Seq((1L, -251L, 90L), (1L, -250L, 91L), (1L, -99L, 92L),
      (1L, 0L, 93L), (1L, 99L, 94L), (1L, 100L, 95L), (1L, 301L, 96L))
      .toDF("user_id", "ts", "event_id")
    for (cw <- Seq(None, Some(100L)): Seq[Option[Long]]) {
      val out = TimeJoins.asofBackward(l, r, Seq("user_id"), "ts", "ts",
          rightPrefix = "r_", chunkWidth = cw)
        .collect().map(x => x.getAs[Long]("event_id") ->
          Option(x.getAs[java.lang.Long]("r_event_id"))).toMap
      assert(out(90L) == None, cw)
      assert(out(91L) == Some(1L), cw)      // equal-ts match at chunk edge
      assert(out(92L) == Some(2L), cw)
      assert(out(93L) == Some(3L), cw)
      assert(out(94L) == Some(3L), cw)      // carried into chunk [0,100)
      assert(out(95L) == Some(4L), cw)
      assert(out(96L) == Some(4L), cw)      // across an empty chunk
    }
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval: binned equi-join equals brute-force BETWEEN, once per pair") {
    val points = Seq((1L, 0L, 1L), (1L, 999L, 2L), (1L, 1000L, 3L),
      (1L, 5500L, 4L), (2L, 100L, 5L), (3L, 100L, 6L))
      .toDF("k", "pos", "pid")
    val intervals = Seq(
      (1L, 0L, 999L, "a"),        // exactly one bin
      (1L, 500L, 5500L, "b"),     // spans 6 bins, inclusive ends
      (1L, 7000L, 7001L, "c"),    // matches nothing
      (2L, 0L, 200L, "d"),
      (1L, 10L, 5L, "bad"))       // lo > hi: dropped
      .toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pos", "lo", "hi", binWidth = Some(1000L))
      .select("pid", "name").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    // brute force on the driver
    val p = Seq((1L, 0L, 1L), (1L, 999L, 2L), (1L, 1000L, 3L),
      (1L, 5500L, 4L), (2L, 100L, 5L), (3L, 100L, 6L))
    val i = Seq((1L, 0L, 999L, "a"), (1L, 500L, 5500L, "b"),
      (1L, 7000L, 7001L, "c"), (2L, 0L, 200L, "d"))
    val want = (for {
      (pk, pos, pid) <- p
      (ik, lo, hi, name) <- i
      if pk == ik && pos >= lo && pos <= hi
    } yield (pid, name)).sorted
    assert(got == want)
    // each matching pair appears exactly once (the point's single bin)
    assert(got.distinct == got)
  }

  test("bins are exact above 2^53 (float division would round a pair away)") {
    // base just above 2^53: binWidth 3 puts base+4 in bin (base+4) div 3;
    // floor((base+4)/3.0) computes on doubles that can't represent odd
    // longs here, so the float bin of point vs interval endpoints can
    // disagree — the div formulation must keep the BETWEEN pair
    val base = (1L << 53) + 1L
    val points = Seq((1L, base + 4L, 1L), (1L, base + 6L, 2L))
      .toDF("k", "pos", "pid")
    val intervals = Seq((1L, base + 3L, base + 5L, "w"))
      .toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pos", "lo", "hi", binWidth = Some(3L))
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("negative coordinates: truncation bins stay monotone, pairs exact") {
    val points = Seq((1L, -15L, 1L), (1L, -1L, 2L), (1L, 3L, 3L))
      .toDF("k", "pos", "pid")
    val intervals = Seq((1L, -20L, -10L, "a"), (1L, -5L, 5L, "b"))
      .toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pos", "lo", "hi", binWidth = Some(10L))
      .select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "b")))
  }

  test("derived bin width: median span, result identical to explicit width") {
    val points = (0L until 200L).map(p => (1L, p * 37L % 5000L, p))
      .toDF("k", "pos", "pid")
    val intervals = (0L until 40L).map(i => (1L, i * 100L, i * 100L + 150L, s"i$i"))
      .toDF("k", "lo", "hi", "name")
    val auto = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "pos", "lo", "hi").select("pid", "name").collect().toSet
    val fixed = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "pos", "lo", "hi", binWidth = Some(151L))
      .select("pid", "name").collect().toSet
    assert(auto == fixed && auto.nonEmpty)
  }

  test("degenerate whole-domain interval raises a named error, not an explode") {
    val points = Seq((1L, 5L, 1L)).toDF("k", "pos", "pid")
    val intervals = Seq((1L, 0L, 100L, "ok"), (1L, 0L, Long.MaxValue / 2, "bad"))
      .toDF("k", "lo", "hi", "name")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pos", "lo", "hi", binWidth = Some(10L)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("range join: interval spans")),
      s"wanted the named guard error, got: ${msgs(e).mkString(" | ")}")
  }

  test("interval overlap: equals brute force, exactly once per pair, any width") {
    val rnd = new scala.util.Random(17)
    val as = (0 until 120).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (1L + rnd.nextInt(3), lo, lo + rnd.nextInt(800), i.toLong)
    }
    val bs = (0 until 150).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (1L + rnd.nextInt(3), lo, lo + rnd.nextInt(400), 1000L + i)
    }
    val want = (for {
      (ka, alo, ahi, aid) <- as
      (kb, blo, bhi, bid) <- bs
      if ka == kb && alo <= bhi && blo <= ahi
    } yield (aid, bid)).sorted
    val aDf = as.toDF("k", "a_lo", "a_hi", "aid")
    val bDf = bs.toDF("k", "b_lo", "b_hi", "bid")
    for (w <- Seq(None, Some(64L), Some(1000L), Some(100000L)): Seq[Option[Long]]) {
      val got = RangeJoin.intervalOverlap(aDf, bDf, Seq("k"),
          "a_lo", "a_hi", "b_lo", "b_hi", binWidth = w)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"width=$w")
      assert(got.distinct == got, s"width=$w emitted a pair twice")
    }
    // colliding non-key columns rejected by name
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(aDf, aDf, Seq("k"),
        "a_lo", "a_hi", "a_lo", "a_hi")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("non-integral coordinate column is rejected by name") {
    val points = Seq((1L, 1.5, 1L)).toDF("k", "pos", "pid")
    val intervals = Seq((1L, 0L, 100L, "a")).toDF("k", "lo", "hi", "name")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"), "pos", "lo", "hi")
    }
    assert(e.getMessage.contains("`pos`") || e.getMessage.contains("pos"))
  }

  test("stale memoized width after an in-place rewrite: documented error + clearWidthMemo recovery") {
    // the width memo keys on the interval frame's CANONICAL PLAN — an
    // in-place parquet rewrite keeps the plan, so the stale (too small)
    // width can push a legitimately wide interval past maxBinsPerInterval;
    // the error must name the recovery and the recovery must work
    val dir = java.nio.file.Files.createTempDirectory("rj-memo").toString
    val points = Seq((1L, 50L, 1L)).toDF("k", "pos", "pid")
    Seq((1L, 0L, 1L, "n1"), (1L, 2L, 3L, "n2"), (1L, 4L, 5L, "n3"))
      .toDF("k", "lo", "hi", "name")
      .write.mode("overwrite").parquet(dir)
    def intervals = spark.read.parquet(dir)
    def joined = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "pos", "lo", "hi", maxBinsPerInterval = 64L)
    RangeJoin.clearWidthMemo()
    assert(joined.count() == 0) // derives width 2, memoizes on the plan
    // rewrite in place: one interval now spans 200 bins at the stale width
    Seq((1L, 0L, 399L, "wide")).toDF("k", "lo", "hi", "name")
      .write.mode("overwrite").parquet(dir)
    spark.catalog.clearCache()
    val e = intercept[Exception] { joined.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("clearWidthMemo")),
      s"degenerate-interval error must name the recovery: ${e.getMessage}")
    RangeJoin.clearWidthMemo()
    assert(joined.count() == 1) // freshly derived width: wide interval fits
  }
}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // driver-side exact replay of the register + estimate math
  private def expected(values: Seq[String]): (Long, Long, Double) = {
    val regs = values.map { v =>
      val hex = md5hex(v)
      val bucket = Integer.parseInt(hex.substring(0, 4), 16) % 4096
      val stripped = hex.substring(4, 16).dropWhile(_ == '0')
      val rho =
        if (stripped.isEmpty) 49
        else {
          val clz4 = stripped.head match {
            case '1' => 3
            case '2' | '3' => 2
            case '4' | '5' | '6' | '7' => 1
            case _ => 0
          }
          (12 - stripped.length) * 4 + clz4 + 1
        }
      bucket -> rho
    }.groupBy(_._1).map { case (b, v) => b -> v.map(_._2).max }
    val mUsed = regs.size.toLong
    val vEmpty = 4096L - mUsed
    val regSum = regs.values.map(mj => 1L << (50 - mj)).sum +
      vEmpty * (1L << 50)
    val estRaw = 0.7213 / (1.0 + 1.079 / 4096.0) * 4096 * 4096 /
      (regSum.toDouble / (1L << 50))
    val est =
      if (estRaw <= 2.5 * 4096 && vEmpty > 0)
        4096 * math.log(4096.0 / vEmpty)
      else estRaw
    (mUsed, regSum,
      BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hll: registers and estimate replay exactly; repartition-invariant") {
    val values = (0 until 600).map(i => s"doc-$i")
    val df = values.map(v => ("en", v)).toDF("lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllDistinct(d, Seq("lang"), "text").collect().map(r =>
        (r.getAs[Long]("m_used"), r.getAs[Long]("reg_sum"),
          r.getAs[Double]("est_distinct"))).head
    val got = run(df)
    assert(got == expected(values))
    // registers are max-merged: ANY partitioning gives identical output
    assert(run(df.repartition(7)) == got)
    // duplicates change nothing — the sketch counts distincts
    assert(run(df.unionAll(df.limit(200))) == got)
  }

  test("hll: estimate lands within 5% of the true distinct count") {
    val n = 5000
    val df = (0 until n).map(i => ("en", s"value-$i")).toDF("lang", "text")
    val est = Sketches.hllDistinct(df, Seq("lang"), "text")
      .collect().head.getAs[Double]("est_distinct")
    assert(math.abs(est - n) / n < 0.05, s"estimate $est vs $n")
  }

  test("kmv: bottom-k set replays exactly; order/partition/dup-invariant") {
    val values = (0 until 900).map(i => s"doc-$i")
    val df = values.map(v => ("en", v)).toDF("lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinct(d, Seq("lang"), "text", k = 64).collect().map(r =>
        (r.getAs[Long]("n_kept"), r.getAs[String]("kth_hash"),
          r.getAs[Double]("est_distinct"))).head
    val got = run(df)
    // driver-side exact replay
    val sorted = values.map(md5hex).distinct.sorted.take(64)
    val kth = sorted.last
    val frac = java.lang.Long.parseLong(kth.substring(0, 13), 16).toDouble /
      (1L << 52)
    val est = BigDecimal(63 / frac)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((64L, kth, est)))
    assert(run(df.repartition(11)) == got)
    assert(run(df.unionAll(df.limit(333))) == got)
    // under-k group: the sketch IS the distinct set, estimate exact
    val tiny = Seq(("de", "a"), ("de", "b"), ("de", "a")).toDF("lang", "text")
    val t = Sketches.kmvDistinct(tiny, Seq("lang"), "text", k = 64)
      .collect().head
    assert(t.getAs[Long]("n_kept") == 2L &&
      t.getAs[Double]("est_distinct") == 2.0)
  }

  test("kmv: estimate lands within 15% of truth at k=256") {
    val n = 5000
    val df = (0 until n).map(i => ("en", s"value-$i")).toDF("lang", "text")
    val est = Sketches.kmvDistinct(df, Seq("lang"), "text")
      .collect().head.getAs[Double]("est_distinct")
    assert(math.abs(est - n) / n < 0.15, s"estimate $est vs $n")
  }

  test("cm: estimates replay exactly, upper-bound truth, merge adds") {
    val freq = Map("alpha" -> 40, "beta" -> 15, "gamma" -> 3)
    val values = freq.toSeq.flatMap { case (v, n) => Seq.fill(n)(v) }
    val df = values.map(Tuple1(_)).toDF("term")
    val counters = Sketches.cmSketch(df, "term", depth = 4, width = 64)
    val probes = Seq("alpha", "beta", "gamma", "never-seen").map(Tuple1(_))
      .toDF("term")
    val est = Sketches.cmEstimate(counters, probes, "term",
        depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_count")).toMap
    // driver-side exact replay of buckets + counters + min: row j reads
    // hex chars [4j, 4j+4) of ONE digest (16 bits, uniform mod 64)
    def bucket(j: Int, v: String): Int =
      (java.lang.Long.parseLong(md5hex(v).substring(4 * j, 4 * j + 4), 16)
        % 64).toInt
    val counts = values.flatMap(v => (0 until 4).map(j => (j, bucket(j, v))))
      .groupBy(identity).map { case (k, s) => k -> s.size.toLong }
    def replay(v: String): Long =
      (0 until 4).map(j => counts.getOrElse((j, bucket(j, v)), 0L)).min
    for (p <- Seq("alpha", "beta", "gamma", "never-seen")) {
      assert(est(p) == replay(p), s"probe $p")
      assert(est(p) >= freq.getOrElse(p, 0).toLong, s"CM must upper-bound $p")
    }
    // merging two half-sketches equals sketching the whole
    val (h1, h2) = values.splitAt(25)
    val merged = Sketches.cmMergeCounters(
        Sketches.cmSketch(h1.map(Tuple1(_)).toDF("term"), "term", 4, 64),
        Sketches.cmSketch(h2.map(Tuple1(_)).toDF("term"), "term", 4, 64))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("cnt"))
      .toMap
    val whole = counters.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("cnt")).toMap
    assert(merged == whole)
  }

  test("bloom: no false negatives, exact word replay, merge ORs") {
    val members = (0 until 500).map(i => s"member-$i")
    val df = members.map(Tuple1(_)).toDF("text")
    val bits = Sketches.bloomBits(df, "text", mBits = 4096, k = 5)
    // driver-side exact replay of the word table: double-hashed
    // positions (h1 + i*h2, h2 odd) from ONE digest per value
    val positions = members.flatMap { v =>
      val hex = md5hex(v)
      val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16) * 2 + 1
      (0 until 5).map(i => ((h1 + i * h2) % 4096).toInt)
    }
    val wantWords = positions.groupBy(_ / 63)
      .map { case (w, ps) =>
        w -> ps.map(p => 1L << (p % 63)).reduce(_ | _) }
    val gotWords = bits.collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("bits")).toMap
    assert(gotWords == wantWords)
    // membership: every member hits all 5 bits (no false negatives),
    // regardless of how the build frame was partitioned
    val probes = (members.take(50).map(v => (v, "present")) ++
      (0 until 50).map(i => (s"absent-$i", "control")))
      .toDF("probe", "kind")
    val got = Sketches.bloomContains(
        Sketches.bloomBits(df.repartition(7), "text", 4096, 5),
        probes, "probe", 4096, 5)
      .collect().map(r => r.getAs[String]("probe") ->
        ((r.getAs[Long]("bits_set"), r.getAs[Boolean]("maybe_member")))).toMap
    members.take(50).foreach(v => assert(got(v) == ((5L, true)), v))
    // at 2500 set bits of 4096 the FP rate is high but not 100%: at
    // least one control must miss, and misses have bits_set < 5
    val misses = (0 until 50).map(i => got(s"absent-$i")).filterNot(_._2)
    assert(misses.nonEmpty && misses.forall(_._1 < 5L))
    // merging two half-filters ORs to the one-shot word table
    val (h1, h2) = members.splitAt(250)
    val merged = Sketches.bloomMergeBits(
        Sketches.bloomBits(h1.map(Tuple1(_)).toDF("text"), "text", 4096, 5),
        Sketches.bloomBits(h2.map(Tuple1(_)).toDF("text"), "text", 4096, 5))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("bits")).toMap
    assert(merged == wantWords)
    // fully-duplicated probe rows collapse into one group — bits_set
    // must still read k (distinct probe indices, not summed hit rows),
    // so a present value can never report maybe_member=false
    val dupProbes = Seq("member-1", "member-1", "member-1",
      "absent-x", "absent-x").map(Tuple1(_)).toDF("probe")
    val dupGot = Sketches.bloomContains(
        Sketches.bloomBits(df, "text", 4096, 5), dupProbes, "probe", 4096, 5)
      .collect().map(r => r.getAs[String]("probe") ->
        ((r.getAs[Long]("bits_set"), r.getAs[Boolean]("maybe_member")))).toMap
    assert(dupGot.size == 2)
    assert(dupGot("member-1") == ((5L, true)), dupGot.toString)
    assert(dupGot("absent-x")._1 <= 5L)
  }

  test("bloom/cm probes may carry pos/word/bit/row/bucket/cnt columns (scratch is __-prefixed)") {
    val df = (0 until 100).map(i => Tuple1(s"v-$i")).toDF("text")
    val bits = Sketches.bloomBits(df, "text", mBits = 4096, k = 5)
    // a probe frame whose own columns shadow every former scratch name
    val probes = Seq(("v-1", 1L, 2L, 3L, 4L), ("nope", 9L, 9L, 9L, 9L))
      .toDF("probe", "pos", "word", "bit", "bits")
    val got = Sketches.bloomContains(bits, probes, "probe", 4096, 5)
      .collect().map(r => r.getAs[String]("probe") ->
        r.getAs[Boolean]("maybe_member")).toMap
    assert(got("v-1"))
    assert(probes.columns.forall(c =>
      Sketches.bloomContains(bits, probes, "probe", 4096, 5).columns.contains(c)))

    val counters = Sketches.cmSketch(df, "text", depth = 4, width = 512)
    val cmProbes = Seq(("v-1", 0, 0, 0L), ("nope", 9, 9, 9L))
      .toDF("probe", "row", "bucket", "cnt")
    val est = Sketches.cmEstimate(counters, cmProbes, "probe", 4, 512)
      .collect().map(r => r.getAs[String]("probe") ->
        r.getAs[Long]("est_count")).toMap
    assert(est("v-1") >= 1L)
  }

  test("qsketch: exact integer bucketing replays driver-side; small values exact") {
    // driver-side replica of the bucketing contract
    def bucket(v: Long): (Long, Long) = {
      val a = math.abs(v)
      if (a < 128L) (v, 1L)
      else {
        val sh = (63 - java.lang.Long.numberOfLeadingZeros(a)) - 7
        val w = 1L << sh
        val l = (a >> sh) << sh
        if (v >= 0) (l, w) else (-(l + w - 1), w)
      }
    }
    val values = Seq(0L, 1L, 127L, 128L, 129L, 255L, 256L, 300L, 301L,
      -1L, -127L, -128L, -300L, 999999L, (1L << 53) + 12345L,
      -((1L << 53) + 12345L), Long.MaxValue)
    val got = Sketches.qsketchBuckets(
        values.map(v => ("g", v)).toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => ((r.getAs[Long]("blo"), r.getAs[Long]("bw")),
        r.getAs[Long]("cnt"))).toMap
    val want = values.map(bucket).groupBy(identity)
      .map { case (b, v) => b -> v.size.toLong }
    assert(got == want)
    // small magnitudes are their own exact bucket; sign mirroring holds
    assert(got(((127L, 1L))) == 1L && got(((-127L, 1L))) == 1L)
    // every value lands INSIDE its bucket
    values.foreach { v =>
      val (lo, w) = bucket(v)
      assert(lo <= v && v <= lo + w - 1, s"$v outside [$lo, ${lo + w - 1}]")
    }
    // malformed doubles (NaN, +-Inf, past long range) DROP, never throw
    val dirty = Seq(1.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e300, 5.0).map(("g", _)).toDF("g", "v")
    val cnt = Sketches.qsketchBuckets(dirty, Seq("g"), "v")
      .agg(sum(col("cnt"))).collect().head.getLong(0)
    assert(cnt == 2L)

    // the native codegen expressions == the engine-portable STRING
    // formulation (conv-to-binary log2) at random magnitudes — the
    // contract the DuckDB oracle replays
    val rnd = new scala.util.Random(5)
    val vs = (values ++ (0 until 500).map(_ => rnd.nextLong()))
      .filterNot(_ == Long.MinValue).map(Tuple1(_)).toDF("v")
    val sqlForm =
      """named_struct(
        |  'slo', if(v >= 0,
        |    shiftleft(abs(v) div shiftleft(cast(1 as bigint), sh), sh),
        |    -(shiftleft(abs(v) div shiftleft(cast(1 as bigint), sh), sh)
        |      + shiftleft(cast(1 as bigint), sh) - 1)),
        |  'sw', shiftleft(cast(1 as bigint), sh))""".stripMargin
    val mismatch = vs
      .withColumn("sh", when(abs(col("v")) < 128, lit(0))
        .otherwise(length(conv(abs(col("v")).cast("string"), 10, 2)) - 1 - 7))
      .withColumn("s", expr(sqlForm))
      .withColumn("nlo", graft.functions.SketchExpressions.qsketchLo(col("v"), 7))
      .withColumn("nw", graft.functions.SketchExpressions.qsketchWidth(col("v"), 7))
      .filter(col("s.slo") =!= col("nlo") || col("s.sw") =!= col("nw"))
      .count()
    assert(mismatch == 0L, "native bucketing diverged from the string contract")
  }

  test("qsketch: merge == one-shot; repartition/order-invariant; bounded rows") {
    val rnd = new scala.util.Random(11)
    val xs = (0 until 4000).map(_ => ("a", rnd.nextLong() % 1000000L)) ++
      (0 until 1000).map(i => ("b", i.toLong * 37L))
    val df = xs.toDF("g", "v")
    val one = Sketches.qsketchBuckets(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val (h1, h2) = xs.splitAt(2500)
    val merged = Sketches.qsketchMerge(
        Sketches.qsketchBuckets(h1.toDF("g", "v").repartition(5), Seq("g"), "v"),
        Sketches.qsketchBuckets(h2.toDF("g", "v").repartition(3), Seq("g"), "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == one)
    // quantiles of the merged sketch == quantiles of the one-shot sketch
    val qs = Seq(0.1, 0.5, 0.9)
    val qOne = Sketches.qsketchQuantilesOf(df, Seq("g"), "v", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4)).toMap
    val qMerged = Sketches.qsketchQuantiles(
        Sketches.qsketchMerge(
          Sketches.qsketchBuckets(h1.toDF("g", "v"), Seq("g"), "v"),
          Sketches.qsketchBuckets(h2.toDF("g", "v"), Seq("g"), "v")),
        Seq("g"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4)).toMap
    assert(qOne == qMerged)
    // bounded state: far fewer bucket rows than values
    assert(one.count(_._1 == "a") < 1500, "bucket table must compress")
  }

  test("qsketch: quantile relative error <= 2^-7 vs exact at 5k+ values") {
    val rnd = new scala.util.Random(3)
    // uniform + heavy-tail mix, 6000 values, incl. negatives
    val xs = (0 until 3000).map(_ => rnd.nextInt(200000).toLong - 50000L) ++
      (0 until 3000).map(_ => math.round(math.exp(rnd.nextDouble() * 14)))
    val sorted = xs.sorted
    val n = xs.size
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Sketches.qsketchQuantilesOf(
        xs.map(v => ("g", v)).toDF("g", "v"), Seq("g"), "v", qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(4)).toMap
    qs.foreach { q =>
      val t = math.max(1, math.ceil(q * n).toLong).toInt
      val exact = sorted(t - 1)
      val err = math.abs(got(q) - exact)
      // documented bound: the estimate lands in the true value's bucket,
      // bucket width < 2^-subBits of its magnitude (exact below 2^7)
      val bound = math.max(math.abs(exact.toDouble) / 128.0, 1.0)
      assert(err <= bound, s"q=$q est=${got(q)} exact=$exact err=$err > $bound")
    }
  }

  test("hll: incremental merge equals the one-shot sketch") {
    val a = (0 until 300).map(i => ("en", s"d$i")).toDF("lang", "text")
    val b = (200 until 500).map(i => ("en", s"d$i")).toDF("lang", "text")
    val merged = Sketches.hllEstimate(
      Sketches.hllMergeRegisters(
        Sketches.hllRegisters(a, Seq("lang"), "text"),
        Sketches.hllRegisters(b, Seq("lang"), "text")),
      Seq("lang")).collect().head
    val oneShot = Sketches.hllDistinct(
      a.unionAll(b), Seq("lang"), "text").collect().head
    assert(merged == oneShot)
  }

  test("cm heavy hitters: exact vs brute force on a long tail; tail pruned") {
    // 5 hot values x500 + 5000 singletons: threshold 0.02*7500 = 150
    val values = (0 until 5).flatMap(i => Seq.fill(500)(s"hot-$i")) ++
      (0 until 5000).map(i => s"rare-$i")
    val df = values.map(Tuple1(_)).toDF("term")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.cmHeavyHitters(d, "term", minShare = 0.02)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val got = run(df)
    val brute = values.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 150L).toSeq.sorted
    assert(got == brute)
    assert(run(df.repartition(13)) == got)
    // the CM pre-filter genuinely prunes: at width 8192 over a 5005-term
    // vocab, almost no singleton's FOUR buckets are all hot — the exact
    // count aggregate sees a candidate set, not the vocabulary
    val counters = Sketches.cmSketch(df, "term", 4, 8192)
    val candidates = Sketches.cmEstimate(counters,
        values.distinct.map(Tuple1(_)).toDF("term"), "term")
      .filter(col("est_count") >= 150L).count()
    assert(candidates < 100L,
      s"CM filter should prune the 5005-term vocab, kept $candidates")
  }

  test("cm heavy hitters: threshold edge is >= ceil; no join in the plan") {
    // total 19, ceil(0.5*19) = 10: 'a' (10) is in, 'b' (9) is out
    val df = (Seq.fill(10)("a") ++ Seq.fill(9)("b")).map(Tuple1(_))
      .toDF("term")
    val hh = Sketches.cmHeavyHitters(df, "term", minShare = 0.5)
    assert(hh.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 10L)))
    // the pass-2 filter is a literal-bitmap predicate, never a join
    assert(!hh.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("kmv overlap: exact below k; jaccard 0/1 edges") {
    val df = (Seq("a", "b", "c", "d").map(("g1", _)) ++
      Seq("c", "d", "e").map(("g2", _)) ++
      Seq("c", "d", "e").map(("g3", _)) ++
      Seq("x", "y").map(("g4", _))).toDF("lang", "text")
    val got = Sketches.kmvOverlap(df, "lang", "text", k = 16)
      .collect().map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("both_cnt"),
          r.getAs[Double]("est_union"), r.getAs[Double]("est_jaccard"),
          r.getAs[Double]("est_intersection"))).toMap
    assert(got.size == 6)
    // |g1 u g2| = 5, |g1 n g2| = 2 — everything exact below k
    assert(got(("g1", "g2")) == ((5L, 2L, 5.0, 0.4, 2.0)))
    // identical sets: jaccard exactly 1, intersection = union
    assert(got(("g2", "g3")) == ((3L, 3L, 3.0, 1.0, 3.0)))
    // disjoint sets: jaccard exactly 0
    assert(got(("g1", "g4")) == ((6L, 0L, 6.0, 0.0, 0.0)))
  }

  test("kmv overlap: saturated sketches replay exactly; match union sketch") {
    // 900 + 900 values sharing 300: both sketches saturate at k=64
    val aVals = (0 until 900).map(i => s"doc-$i")
    val bVals = (600 until 1500).map(i => s"doc-$i")
    val df = (aVals.map(("a", _)) ++ bVals.map(("b", _))).toDF("lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvOverlap(d, "lang", "text", k = 64).collect().map(r =>
        (r.getAs[Long]("n_kept"), r.getAs[String]("kth_hash"),
          r.getAs[Long]("both_cnt"), r.getAs[Double]("est_union"),
          r.getAs[Double]("est_jaccard"))).head
    val got = run(df)
    // driver-side exact replay: bottom-64 of the union's distinct hashes,
    // membership per side read off the ORIGINAL sets
    val aH = aVals.map(md5hex).toSet
    val bH = bVals.map(md5hex).toSet
    val ku = (aH ++ bH).toSeq.sorted.take(64)
    val kth = ku.last
    val both = ku.count(h => aH(h) && bH(h)).toLong
    val frac = java.lang.Long.parseLong(kth.substring(0, 13), 16).toDouble /
      (1L << 52)
    def r4(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((64L, kth, both, r4(63 / frac), r4(both * 1.0 / 64))))
    assert(run(df.repartition(9)) == got)
    // the pair's union sketch IS the sketch of the union: est_union must
    // equal kmvDistinct over the concatenated data
    val unionEst = Sketches.kmvDistinct(
      df.drop("lang").withColumn("lang", lit("u")), Seq("lang"), "text",
      k = 64).collect().head.getAs[Double]("est_distinct")
    assert(got._4 == unionEst)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(1.0f, 1.0f)),
    (3L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine fold math") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" === 0 && $"b.vec_id" === 3)
      .select(Similarity.cosine($"a.embedding", $"b.embedding")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("SQ8: exact quantization replay, clamp, zero vector, topk == brute adot") {
    val data = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.1f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),    // zero vector
      (2L, Array(-2.0f, 1.0f, 0.5f, -0.25f)),
      (3L, Array(0.003f, 0.381f, -0.254f, 0.127f)))
      .toDF("vec_id", "embedding")
    val enc = Similarity.sqQuantize(data, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Int](2).toSeq))).toMap
    // driver-side exact replay of scale + clamped codes
    def replay(v: Array[Float]): (Double, Seq[Int]) = {
      val scale = BigDecimal(v.map(x => math.abs(x.toDouble)).max / 127.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (scale == 0.0) (0.0, v.toSeq.map(_ => 0))
      else (scale, v.toSeq.map(x => math.min(127L, math.max(-127L,
        BigDecimal(x.toDouble / scale)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)).toInt))
    }
    Seq(0L, 2L, 3L).foreach { id =>
      val v = data.filter($"vec_id" === id)
        .collect()(0).getSeq[Float](1).toArray
      assert(enc(id) == replay(v), s"vec $id")
    }
    assert(enc(1L) == ((0.0, Seq(0, 0, 0, 0))))
    // the max component always lands exactly on +-127 (clamp holds even
    // when the 6-dp scale rounds below maxabs/127)
    assert(enc(2L)._2.min == -127 && enc(0L)._2.max == 127)
    // topk equals a brute-force replay of the asymmetric dot
    val got = Similarity.sqTopK(data, data.filter($"vec_id" < 2),
        "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).sorted.toSeq
    val vecsById = data.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val brute = (for {
      q <- Seq(0L, 1L); n <- Seq(0L, 1L, 2L, 3L) if n != q
      (scale, codes) = replay(vecsById(n))
      adot = BigDecimal(scale * codes.zip(vecsById(q))
        .foldLeft(0.0) { case (acc, (c, x)) => acc + c * x.toDouble })
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (q, n, adot))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case ((q, n, d), i) => (q, n, d, i + 1L) }
      }.sorted
    assert(got == brute)
    // repartition invariance
    val again = Similarity.sqTopK(data.repartition(5),
        data.filter($"vec_id" < 2), "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).sorted.toSeq
    assert(again == got)
  }

  test("IVF+SQ8: probing every list == plain SQ8 topk; nprobe prunes") {
    val data = (0L until 40L).map(i =>
        (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 13 - 6).toFloat / 4f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(data, "vec_id", "embedding", 4)
    val queries = data.filter($"vec_id" < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    // nprobe == numLists: nothing prunes, so the composition must equal
    // the exhaustive SQ8 scan bit-for-bit (same quantizer, same ranks)
    val full = rows(Similarity.ivfSqTopK(data, queries,
      "vec_id", "embedding", k = 5, nprobe = 4, cents))
    val plain = rows(Similarity.sqTopK(data, queries,
      "vec_id", "embedding", k = 5))
    assert(full == plain)
    // nprobe = 1 genuinely prunes: still ranked output, never more than
    // k per query, and every kept dot also appears in the full scan's
    // candidate space (same quantizer — only the candidate set shrank)
    val pruned = rows(Similarity.ivfSqTopK(data, queries,
      "vec_id", "embedding", k = 5, nprobe = 1, cents))
    assert(pruned.nonEmpty && pruned.size <= 15)
    val fullPairs = rows(Similarity.sqTopK(data, queries,
      "vec_id", "embedding", k = 40)).map(r => (r._1, r._2, r._3))
    assert(pruned.forall(p => fullPairs.contains((p._1, p._2, p._3))))
  }

  test("IVF+binary: probing every list == plain binary topk; nprobe prunes") {
    val data = (0L until 40L).map(i =>
        (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 13 - 6).toFloat / 4f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(data, "vec_id", "embedding", 4)
    val queries = data.filter($"vec_id" < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val full = rows(Similarity.ivfBqTopK(data, queries,
      "vec_id", "embedding", k = 5, nprobe = 4, cents))
    val plain = rows(Similarity.bqTopK(data, queries,
      "vec_id", "embedding", k = 5))
    assert(full == plain)
    // nprobe = 1: candidate set shrinks, every kept hamming also exists
    // in the exhaustive scan's candidate space
    val pruned = rows(Similarity.ivfBqTopK(data, queries,
      "vec_id", "embedding", k = 5, nprobe = 1, cents))
    assert(pruned.nonEmpty && pruned.size <= 15)
    val fullPairs = rows(Similarity.bqTopK(data, queries,
      "vec_id", "embedding", k = 40)).map(r => (r._1, r._2, r._3))
    assert(pruned.forall(p => fullPairs.contains((p._1, p._2, p._3))))
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top == Seq(3L, 2L, 1L)) // colinear first, diagonal, orthogonal
  }

  test("clusterBalancedSample: <= perList per cluster, partition-invariant, seed-sensitive") {
    val data = vecs // the 4-vector fixture; 2 clusters from 2 seed centroids
    val cents = Similarity.seedCentroids(data, "vec_id", "embedding", 2)
    val s1 = Similarity.clusterBalancedSample(data, "vec_id", "embedding",
        cents, perList = 1, seed = "a")
      .collect().map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("pick"),
        r.getAs[Long]("vec_id"))).toSet
    // exactly one pick per non-empty cluster, pick is always 1
    assert(s1.forall(_._2 == 1L) && s1.map(_._1).size == s1.size)
    // stable under repartitioning
    val s1b = Similarity.clusterBalancedSample(data.repartition(5), "vec_id",
        "embedding", cents, perList = 1, seed = "a")
      .collect().map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("pick"),
        r.getAs[Long]("vec_id"))).toSet
    assert(s1 == s1b)
    // perList >= cluster size keeps everything, ranked by race
    val all = Similarity.clusterBalancedSample(data, "vec_id", "embedding",
        cents, perList = 10, seed = "a")
    assert(all.count() == data.count())
  }

  test("sqRerankTopK with a full-collection shortlist equals brute force bit-for-bit") {
    val queries = vecs.filter($"vec_id" === 0)
    // shortlist covering everything => the exact re-rank IS brute force
    val rr = Similarity.sqRerankTopK(vecs, queries, "vec_id", "embedding",
        k = 3, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val bf = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding",
        k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(rr == bf, s"re-rank diverged from brute force:\n$rr\n$bf")
    // a pruning shortlist still returns exact-cosine scores for survivors
    val pruned = Similarity.sqRerankTopK(vecs, queries, "vec_id",
        "embedding", k = 2, shortlist = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(pruned.keySet.subsetOf(Set(1L, 2L, 3L)))
    assert(pruned.forall { case (n, c) =>
      bf.exists(t => t._2 == n && t._3 == c) ||
        Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 4)
          .collect().exists(r => r.getLong(1) == n && r.getDouble(2) == c)
    })
    intercept[IllegalArgumentException] {
      Similarity.sqRerankTopK(vecs, queries, "vec_id", "embedding",
        k = 5, shortlist = 3)
    }
  }

  test("bqTopK ranks by hamming asc with id ties; full-shortlist re-rank == brute force") {
    val queries = vecs.filter($"vec_id" === 0)
    // signs: v0=(+,0) v1=(0,+) v2=(+,+) v3=(+,0) -> hamming to v0:
    // v1 = 2 (both dims differ), v2 = 1, v3 = 0
    val bq = Similarity.bqTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(bq(3L) == ((0L, 1L)) && bq(2L) == ((1L, 2L)) && bq(1L) == ((2L, 3L)), bq.toString)
    val rr = Similarity.bqRerankTopK(vecs, queries, "vec_id", "embedding",
        k = 3, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val bf = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding",
        k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(rr == bf, s"binary re-rank diverged from brute force:\n$rr\n$bf")
    // a pruning shortlist keeps exact-cosine scores for its survivors
    val pruned = Similarity.bqRerankTopK(vecs, queries, "vec_id",
        "embedding", k = 1, shortlist = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(pruned.length == 1 && pruned(0)._1 == 3L) // hamming-0 neighbor
    assert(bf.exists(t => t._2 == 3L && t._3 == pruned(0)._2))
    intercept[IllegalArgumentException] {
      Similarity.bqRerankTopK(vecs, queries, "vec_id", "embedding",
        k = 5, shortlist = 3)
    }
  }

  test("ivfAssign puts every vector in exactly one list, nearest centroid wins") {
    // centroids = 2 lowest ids: c0=(1,0), c1=(0,1)
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", numLists = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(assigned.size == 4)
    assert(assigned(0L) == 0L && assigned(3L) == 0L) // colinear with c0
    assert(assigned(1L) == 1L)
    assert(assigned(2L) == 0L) // equidistant: rounded-cosine tie -> smaller id
  }

  test("ivfTopK with nprobe = numLists equals brute force") {
    val ivf = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3, numLists = 2, nprobe = 2)
      .orderBy($"rank").collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank")))
    val bf = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank")))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("ivfTopK probes only nprobe lists") {
    // query 1 = (0,1): its nearest (only probed) list is c1, which holds
    // just vector 1 itself -> no neighbors at nprobe=1
    val res = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 3, numLists = 2, nprobe = 1)
    assert(res.count() == 0)
  }

  test("hyperplane signs are deterministic and lshBucket groups colinear vectors") {
    val p1 = Similarity.hyperplaneSigns(4, 8)
    val p2 = Similarity.hyperplaneSigns(4, 8)
    assert(p1.map(_.toSeq) == p2.map(_.toSeq))
    val planes = Similarity.hyperplaneSigns(4, 2)
    val buckets = vecs.select($"vec_id",
      Similarity.lshBucket($"embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(0L) == buckets(3L)) // colinear vectors, same signs
  }

  // two tight clusters around (1,0) and (0,1); seeds 0 and 1 start in
  // DIFFERENT clusters, so Lloyd's must pull each centroid to its mean
  private val clustered = Seq(
    (0L, Array(1.0f, 0.00f)), (2L, Array(1.0f, 0.10f)),
    (4L, Array(1.0f, -0.1f)), (6L, Array(1.0f, 0.05f)),
    (1L, Array(0.0f, 1.00f)), (3L, Array(0.1f, 1.00f)),
    (5L, Array(-0.1f, 1.0f)), (7L, Array(0.05f, 1.0f))).toDF("vec_id", "embedding")

  test("kmeansCentroids converge to the per-cluster means on separable data") {
    val cents = Similarity.kmeansCentroids(clustered, "vec_id", "embedding",
      k = 2, iters = 3)
    val m = cents.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    assert(m.size == 2)
    // centroid 0 inherits seed 0's cluster (x-heavy), centroid 1 the other
    assert(m(0L)(0) > 0.9 && math.abs(m(0L)(1)) < 0.1)
    assert(m(1L)(1) > 0.9 && math.abs(m(1L)(0)) < 0.1)
    // exact per-dimension means of the converged assignment
    assert(math.abs(m(0L)(1) - (0.0 + 0.10 - 0.1 + 0.05) / 4.0) < 1e-6)
  }

  test("ivfTopKWith trained centroids: assignment matches the true clusters") {
    val cents = Similarity.kmeansCentroids(clustered, "vec_id", "embedding",
      k = 2, iters = 3)
    val assigned = Similarity.ivfAssignWith(clustered, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(Seq(0L, 2L, 4L, 6L).forall(assigned(_) == 0L))
    assert(Seq(1L, 3L, 5L, 7L).forall(assigned(_) == 1L))
    // probing both lists = brute force, trained or seeded alike
    val ivf = Similarity.ivfTopKWith(clustered,
      clustered.filter($"vec_id" === 0), "vec_id", "embedding",
      k = 3, nprobe = 2, cents)
      .orderBy($"rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val bf = Similarity.bruteForceTopK(clustered,
      clustered.filter($"vec_id" === 0), "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(ivf == bf)
  }

  test("pq: codebooks slice the seeds, encode is argmin per subspace, ADC ranks by lookup sum") {
    // dim 2, m = 2 (scalar subspaces), 2 codewords from seeds 0=(1,0), 1=(0,1):
    // sub0 codebook = [1.0, 0.0], sub1 codebook = [0.0, 1.0]
    val cb = Similarity.pqCodebooks(clustered, "vec_id", "embedding",
      m = 2, codewords = 2)
    val rows = cb.collect().map(r => (r.getInt(0), r.getLong(1)) ->
      r.getSeq[Double](2).toSeq).toMap
    assert(rows.size == 4 && rows.values.forall(_.length == 1))
    assert(rows((0, 0L)) == Seq(1.0) && rows((0, 1L)) == Seq(0.0))
    assert(rows((1, 0L)) == Seq(0.0) && rows((1, 1L)) == Seq(1.0))

    // x-cluster vectors sit near (1,0): sub0 -> code 0, sub1 -> code 0
    val codes = Similarity.pqEncodeWith(clustered, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(Seq(0L, 2L, 4L, 6L).forall(codes(_) == Seq(0L, 0L)))
    assert(Seq(1L, 3L, 5L, 7L).forall(codes(_) == Seq(1L, 1L)))

    // ADC from query 0: every same-cluster vector shares its codes, so all
    // distances collapse to the code-level distance — x-cluster mates rank
    // first (distance 0 to its own codes), y-cluster after
    val top = Similarity.pqTopKWith(clustered, clustered.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 7, cb)
      .orderBy($"rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
    assert(top.length == 7)
    assert(top.take(3).map(_._1).toSet == Set(2L, 4L, 6L)) // same codes, dist 0
    assert(top.take(3).forall(_._2 == 0.0))
    assert(top.drop(3).forall(_._2 > 0.0))
  }

  test("semanticDedup keeps the lowest id per duplicate group, never pairs across clusters") {
    val cents = Similarity.kmeansCentroids(clustered, "vec_id", "embedding",
      k = 2, iters = 3)
    // within a tight cluster every rounded cosine is ~1 >= 0.9, so each
    // cluster is one duplicate group and only its min id survives
    val kept = Similarity.semanticDedup(clustered, "vec_id", "embedding",
      cents, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept.size == 8)
    assert(kept.filter(_._2).keySet == Set(0L, 1L))
    // a threshold above every intra-cluster cosine keeps everything
    val all = Similarity.semanticDedup(clustered, "vec_id", "embedding",
      cents, threshold = 1.1)
      .collect().map(_.getBoolean(2))
    assert(all.forall(identity))
  }

  test("semanticDedup caps skewed clusters: pair count stays bounded, keeps still deterministic") {
    // one degenerate cluster: 40 near-identical vectors all land in one
    // IVF list — exactly the shape that makes the pair join quadratic.
    // Literal, well-separated centroids pin the assignment (trained
    // centroids on degenerate data would tie-break arbitrarily).
    val skewed = (0L until 40L).map(i =>
      (i, Array(1.0f, (i % 4) * 1e-4f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("centroid_id", "c_vec")
    // cap 10 -> ceil(40/10)=4 md5 sub-lists; the candidate pair count must
    // stay <= sum over sub-lists of n_s*(n_s-1)/2 — far under the 780
    // all-pairs of the uncapped join. Count the pairs the capped join
    // actually forms by replaying its grouping arithmetic.
    val assignedCounts = Similarity.semanticDedup(skewed, "vec_id", "embedding",
      cents, threshold = 2.0, maxClusterSize = 10) // threshold 2.0: count only, keep all
      .collect()
    assert(assignedCounts.length == 40 && assignedCounts.forall(_.getBoolean(2)))
    val subOf = (id: Long) => java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16) % 4
    val subSizes = (0L until 40L).groupBy(subOf).values.map(_.size)
    val boundedPairs = subSizes.map(n => n * (n - 1) / 2).sum
    assert(boundedPairs < 780, s"sub-split must cut the all-pairs count, got $boundedPairs")
    // dedup semantics survive the capping: every vector still resolves to
    // keep=false iff a smaller-id sub-list mate clears the threshold
    val kept = Similarity.semanticDedup(skewed, "vec_id", "embedding",
      cents, threshold = 0.9, maxClusterSize = 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val expectKeep = (0L until 40L).groupBy(subOf).values
      .flatMap(ids => ids.sorted.headOption).toSet
    assert(kept.filter(_._2).keySet == expectKeep,
      s"per-sub-list min ids must survive: ${kept.filter(_._2).keySet} vs $expectKeep")
  }

  test("ivfPqTopK: probing every list equals brute-force ADC; nprobe=1 stays in-list") {
    val cents = Similarity.kmeansCentroids(clustered, "vec_id", "embedding",
      k = 2, iters = 3)
    val cb = Similarity.pqCodebooks(clustered, "vec_id", "embedding",
      m = 2, codewords = 2)
    val ivfpq = Similarity.ivfPqTopK(clustered,
      clustered.filter($"vec_id" === 0), "vec_id", "embedding",
      k = 7, nprobe = 2, cents, cb)
      .orderBy($"rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
    val adc = Similarity.pqTopKWith(clustered, clustered.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 7, cb)
      .orderBy($"rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
    assert(ivfpq.toSeq == adc.toSeq)
    // nprobe=1: query 0 probes only its own (x-heavy) list -> just the
    // three same-cluster mates come back, all at code distance 0
    val pruned = Similarity.ivfPqTopK(clustered,
      clustered.filter($"vec_id" === 0), "vec_id", "embedding",
      k = 7, nprobe = 1, cents, cb)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
    assert(pruned.map(_._1).toSet == Set(2L, 4L, 6L))
    assert(pruned.forall(_._2 == 0.0))
  }

  test("random projection: driver replay, no shuffle, cosine preserved") {
    // deterministic synthetic vectors, 32-dim -> 8-dim
    val dim = 32
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(vecs, "embedding",
      outDim = 8, dim = dim)
    // shape + driver-side exact replay of the sign dot for one row
    val planes = Similarity.hyperplaneSigns(8, dim)
    val got = proj.filter($"vec_id" === 3).select($"proj").collect()
      .head.getSeq[Double](0)
    val raw = vecs.filter($"vec_id" === 3).select($"embedding").collect()
      .head.getSeq[Float](0)
    val want = planes.map { p =>
      var s = 0.0
      var d = 0
      while (d < dim) { s += raw(d).toDouble * p(d); d += 1 }
      BigDecimal(s / math.sqrt(8.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == want)
    // one narrow map pass: no exchange in the plan
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must not shuffle")
    // JL: cosines in the projected space track the originals (loose
    // bound — the guarantee is ~1/sqrt(outDim))
    def cosines(d: org.apache.spark.sql.DataFrame, c: String) = d.as("a")
      .join(d.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        Similarity.cosine(col(s"a.$c"), col(s"b.$c")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val orig = cosines(vecs, "embedding")
    val after = cosines(proj, "proj")
    val errs = orig.map { case (k, v) => math.abs(after(k) - v) }
    assert(errs.max < 0.75 && errs.sum / errs.size < 0.25,
      s"projected cosines drifted: mean ${errs.sum / errs.size} max ${errs.max}")
  }
}

class ZScoreSpec extends SparkSpec {
  import spark.implicits._

  test("zscore clamps at +/-2.5 and zeroes flat groups") {
    val df = Seq(("g1", 2.0), ("g1", 4.0), ("g1", 1024.0),
      ("g2", 8.0), ("g2", 8.0)).toDF("g", "v")
    val z = ZScore.pipeline(df, Seq("g"), "v", dataType = "R", logBase = 2.0)
      .select($"g", $"v", $"zscore").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(z(("g1", 1024.0)) == 2.5 * 0 + z(("g1", 1024.0))) // sanity
    assert(z(("g1", 1024.0)) <= 2.5 && z(("g1", 1024.0)) > 0)
    assert(z(("g2", 8.0)) == 0.0) // stddev 0 -> 0
  }

  test("proteomics flavor: +0.001 zero guard and round-4 log before stats") {
    // i2b2_proteomics_zscore_calc.sql:150 — round(log(2.0, v + 0.001), 4);
    // zeroes survive as log2(0.001), and the stats see the ROUNDED logs
    val df = Seq(("p", 0.0), ("p", 4.0)).toDF("g", "v")
    val r = ZScore.pipeline(df, Seq("g"), "v", dataType = "R", logBase = 2.0,
      zeroGuard = 0.001, logRoundDp = Some(4))
      .collect().map(x => x.getAs[Double]("v") -> x.getAs[Double]("log_intensity")).toMap
    assert(r(0.0) == -9.9658) // round(log2(0.001), 4)
    assert(r(4.0) == 2.0004)  // round(log2(4.001), 4)
    // default (mrna) flavor leaves the log unrounded and unguarded
    val plain = ZScore.pipeline(Seq(("p", 4.0)).toDF("g", "v"), Seq("g"), "v")
      .collect()(0).getAs[Double]("log_intensity")
    assert(plain == 2.0)
  }

  test("null group keys form one window group and keep their rows (intended semantics)") {
    // the window shape groups NULL keys together (SQL window semantics);
    // the old aggregate-join-back shape silently DROPPED null-key rows.
    // This pins the intended behavior: rows survive, stats come from the
    // null group alone.
    val df = Seq((Some("g1"), 2.0), (Some("g1"), 4.0),
      (None, 10.0), (None, 30.0)).toDF("g", "v")
    val z = ZScore.pipeline(df, Seq("g"), "v", dataType = "L")
    val rows = z.collect()
    assert(rows.length == 4, "null-key rows must not be dropped")
    val nullGroup = rows.filter(_.isNullAt(0))
    assert(nullGroup.length == 2)
    // stats over {10, 30} only: mean 20, never polluted by g1's values
    assert(nullGroup.forall(_.getAs[Double]("mean_intensity") == 20.0))
  }

  test("log/raw intensity derivation for dataType L") {
    val df = Seq(("g", 3.0)).toDF("g", "v")
    val r = ZScore.pipeline(df, Seq("g"), "v", dataType = "L", logBase = 2.0).collect()(0)
    assert(r.getAs[Double]("log_intensity") == 3.0)
    assert(r.getAs[Double]("raw_intensity") == 8.0)
  }
}

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Similarity

  private val pairs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f))).toDF("a", "b")

  test("native dot/l2norm match the interpreted fold bit-for-bit") {
    val r = pairs.select(
      Similarity.dot($"a", $"b").as("nat"),
      Similarity.dotFold($"a", $"b").as("fold"),
      Similarity.l2Norm($"a").as("nnat"),
      Similarity.l2NormFold($"a").as("nfold")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // exact equality
      assert(row.getDouble(2) == row.getDouble(3))
    }
    assert(r(0).getDouble(0) == 32.0)
  }

  test("native expressions stay inside WholeStageCodegen") {
    // a LocalRelation gets constant-folded before codegen; use a file scan
    val dir = java.nio.file.Files.createTempDirectory("graft-vec").toString
    pairs.write.mode("overwrite").parquet(dir)
    val fromFile = spark.read.parquet(dir)
    val plan = fromFile.select(Similarity.dot(col("a"), col("b"))).queryExecution
      .executedPlan.toString
    // codegen'd operators print with the '*(stageId)' prefix
    assert(plan.contains("*(1) Project [dotproduct"))
  }

  test("null propagation") {
    val withNull = Seq((Array(1.0f), null: Array[Float])).toDF("a", "b")
    assert(withNull.select(Similarity.dot($"a", $"b")).collect()(0).isNullAt(0))
  }

  // randomized embeddings (fixed seed) stressing rounding boundaries: the
  // native PQ encode / ADC sum must be BIT-identical to the interpreted
  // fold composition it replaced, or the DuckDB oracle hashes drift
  private def randomVecs(n: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(20260814L)
    (0L until n.toLong).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("native pqEncode matches the interpreted fold bit-for-bit") {
    val vecs = randomVecs(200, 8)
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 4, codewords = 16)
    val nat = Similarity.pqEncodeWith(vecs, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val fold = Similarity.pqEncodeWithFold(vecs, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(nat.size == 200)
    assert(nat == fold)
  }

  test("native ADC lookup-sum matches the interpreted fold bit-for-bit") {
    val vecs = randomVecs(100, 8)
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 4, codewords = 8)
    val nTop = Similarity.pqTopKWith(vecs, vecs.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 20, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(nTop.size == 60)
    // replay with the fold on the full cross product and compare distances
    val enc = Similarity.pqEncodeWith(vecs, "vec_id", "embedding", cb)
    val cbs = cb.collect()
    val subLen = 2
    import org.apache.spark.sql.functions._
    val dtab = array((0 until 4).map { s =>
      val cws = cbs.filter(_.getInt(0) == s).sortBy(_.getLong(1))
        .map(_.getSeq[Double](2).toArray)
      array(cws.map { cw =>
        round(aggregate(
          zip_with(slice(transform($"embedding", _.cast("double")),
            s * subLen + 1, subLen), array(cw.map(lit): _*),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v), 6)
      }: _*)
    }: _*)
    val q = vecs.filter($"vec_id" < 3).select($"vec_id".as("q_id"), dtab.as("dt"))
    val foldDist = q.join(enc.select($"vec_id".as("neighbor_id"), $"codes"),
        $"q_id" =!= $"neighbor_id")
      .select($"q_id", $"neighbor_id",
        Similarity.adcDistFold($"dt", $"codes").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    nTop.foreach { case (key, (d, _)) => assert(foldDist(key) == d) }
  }

  test("native pqEncode yields null for vectors shorter than m * subLen") {
    val vecs = randomVecs(8, 8)
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      m = 4, codewords = 4)
    val short = Seq((99L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = Similarity.pqEncodeWith(short, "vec_id", "embedding", cb).collect()
    assert(r.length == 1 && r(0).isNullAt(1))
  }

  test("pqEncode and adc stay inside WholeStageCodegen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    randomVecs(20, 8).write.mode("overwrite").parquet(dir)
    val fromFile = spark.read.parquet(dir)
    val cb = Similarity.pqCodebooks(fromFile, "vec_id", "embedding",
      m = 4, codewords = 4)
    val plan = Similarity.pqEncodeWith(fromFile, "vec_id", "embedding", cb)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_id") && plan.contains("pqencode"))
  }

  test("signPack: exact bit layout across word boundaries; zero/negative clear") {
    import graft.functions.VectorExpressions
    // 70 dims exercises the two-word path; strict > 0 (zeros stay clear)
    val v = Array.tabulate(70)(i =>
      if (i % 3 == 0) 1.5f else if (i % 3 == 1) -0.5f else 0.0f)
    val words = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(VectorExpressions.signPackNative($"embedding"))
      .collect()(0).getSeq[Long](0)
    var w0 = 0L; var w1 = 0L
    for (i <- 0 until 70; if v(i) > 0)
      if (i < 64) w0 |= 1L << i else w1 |= 1L << (i - 64)
    assert(words == Seq(w0, w1), s"got $words, want ${Seq(w0, w1)}")
    // empty vector -> empty words; exact 64 dims -> one word
    val edge = Seq((1L, Array.empty[Float]), (2L, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", VectorExpressions.signPackNative($"embedding").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(edge(1L).isEmpty && edge(2L) == Seq(-1L))
  }

  test("native hamming == positional sign-mismatch count on random vectors") {
    import graft.functions.VectorExpressions
    val a = randomVecs(50, 70)
    // a distinct second side from the same fixture: reversed components
    val joined = a
      .select($"embedding", reverse($"embedding").as("emb_b"))
      .select($"embedding", $"emb_b",
        VectorExpressions.hammingNative(
          VectorExpressions.signPackNative($"embedding"),
          VectorExpressions.signPackNative($"emb_b")).as("ham"))
      .collect()
    joined.foreach { r =>
      val x = r.getSeq[Float](0); val y = r.getSeq[Float](1)
      val expect = x.zip(y).count { case (xi, yi) => (xi > 0) != (yi > 0) }
      assert(r.getLong(2) == expect.toLong)
    }
    // identical vectors: hamming 0
    val self = a.select(VectorExpressions.hammingNative(
      VectorExpressions.signPackNative($"embedding"),
      VectorExpressions.signPackNative($"embedding"))).collect()
    assert(self.forall(_.getLong(0) == 0L))
  }

  test("signPack and hamming stay inside WholeStageCodegen") {
    import graft.functions.VectorExpressions
    val dir = java.nio.file.Files.createTempDirectory("graft-bq").toString
    randomVecs(20, 64).write.mode("overwrite").parquet(dir)
    val fromFile = spark.read.parquet(dir)
    val plan = fromFile.select(VectorExpressions.hammingNative(
        VectorExpressions.signPackNative(col("embedding")),
        VectorExpressions.signPackNative(col("embedding"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hammingwords") &&
      plan.contains("signpack"), plan)
  }
}

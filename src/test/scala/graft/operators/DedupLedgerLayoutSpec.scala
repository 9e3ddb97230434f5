package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-14 ledger layout + screen-prescreen contract: fp and band
  * tables hash-bucketed under each ingest partition, the per-cycle
  * screen pruning history files by the batch's bucket set and filtering
  * the history EXCHANGE through a batch-built Bloom — verdicts
  * bit-identical to the unprescreened screen. */
class DedupLedgerLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "seed corpus document with some stable historical words here"),
    (2L, "second day document with fresh material on parquet compaction"),
    (3L, "a third kept document discussing lakehouse layouts at scale"))
    .toDF("doc_id", "text")

  private def probe = Seq(
    (30L, "seed corpus document with some stable historical words here"), // exact
    (31L, "second day document with fresh material on parquet compactions"), // near
    (32L, "a wholly unrelated probe document nothing resembles anywhere")) // keep
    .toDF("doc_id", "text")

  test("ledger writes bucket directories; compact preserves the layout") {
    val root = java.nio.file.Files.createTempDirectory("ledger_fpb").toString
    val ledger = s"$root/ledger"
    DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
      overwrite = true)
    DedupLedger.write(probe, "doc_id", "text", 3, 8, 2, ledger, "day2")
    def bucketDirs(table: String, col: String): Seq[String] = {
      val d = new java.io.File(s"$ledger/$table")
      d.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith(col + "="))
        .toSeq
    }
    assert(bucketDirs("fp", "fpb").nonEmpty, "fp table not bucket-partitioned")
    assert(bucketDirs("bands", "bkb").nonEmpty,
      "bands table not bucket-partitioned")
    // bucket ids are within the recorded fan-out
    (bucketDirs("fp", "fpb") ++ bucketDirs("bands", "bkb")).foreach { d =>
      val b = d.split("=")(1).toInt
      assert(b >= 0 && b < DedupLedger.Buckets, s"bucket id $b out of range")
    }

    val (fp1, bands1) = DedupLedger.read(spark, ledger, 3, 8, 2)
    assert(fp1.columns.contains("fpb") && bands1.columns.contains("bkb"))
    val before = fp1.orderBy("doc_id", "fp").collect().toSeq

    DedupLedger.compact(spark, ledger, 3, 8, 2)
    assert(bucketDirs("fp", "fpb").nonEmpty,
      "compaction dropped the fp bucket layout")
    assert(bucketDirs("bands", "bkb").nonEmpty,
      "compaction dropped the bands bucket layout")
    val (fp2, _) = DedupLedger.read(spark, ledger, 3, 8, 2)
    assert(fp2.orderBy("doc_id", "fp").collect().toSeq == before,
      "compaction changed ledger content")
  }

  test("prescreened screen verdicts == unprescreened; bloom has no false negatives") {
    val root = java.nio.file.Files.createTempDirectory("ledger_pre").toString
    val ledger = s"$root/ledger"
    DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
      overwrite = true)
    val (fp, bands) = DedupLedger.read(spark, ledger, 3, 8, 2)
    def verdicts(expected: Long): Map[Long, (String, Option[Long])] =
      Dedup.incrementalDedupLedgered(corpus, fp, bands, probe,
          "doc_id", "text", 3, 8, 2, 0.5,
          prescreenExpectedItems = expected,
          prescreenMinHistoryBytes = 0L) // force past the size gate
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    val plain = verdicts(0L) // prescreen disabled
    assert(plain(30L)._1 == "exact" && plain(31L)._1 == "near" &&
      plain(32L)._1 == "keep", plain.toString)
    assert(verdicts(1L << 16) == plain,
      "prescreen changed screen verdicts")

    // the primitive underneath: a Bloom never loses a member
    val vals = (1 to 2000).map(i => s"value_$i")
    val bf = RuntimeFilter.bloomOf(vals.toDF("v"), "v", 1L << 16, 0.001)
    val hits = vals.toDF("v")
      .select(RuntimeFilter.mightContain(bf, col("v")).as("m"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity), "bloom false negative: build/probe mismatch")
  }

  test("prescreen survives an all-exact-dup batch and an empty batch") {
    // a re-delivered batch (every doc an exact dup) leaves NO survivors
    // for the band stage — the band-key bloom builds over zero rows; the
    // sf1 probe caught the aggregate's null buffer crashing here
    val root = java.nio.file.Files.createTempDirectory("ledger_empty").toString
    val ledger = s"$root/ledger"
    DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
      overwrite = true)
    val (fp, bands) = DedupLedger.read(spark, ledger, 3, 8, 2)
    val redelivered = corpus.select((col("doc_id") + 100L).as("doc_id"),
      col("text"))
    val v = Dedup.incrementalDedupLedgered(corpus, fp, bands, redelivered,
        "doc_id", "text", 3, 8, 2, 0.5,
        prescreenMinHistoryBytes = 0L) // force past the size gate
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v.size == 3 && v.values.forall(_ == "exact"), v.toString)

    val empty = corpus.filter(lit(false))
    assert(Dedup.incrementalDedupLedgered(corpus, fp, bands, empty,
      "doc_id", "text", 3, 8, 2, 0.5,
      prescreenMinHistoryBytes = 0L).count() == 0)

    // the primitive: empty and all-null builds yield contains-nothing
    import spark.implicits._
    val emptyBf = RuntimeFilter.bloomOf(Seq.empty[String].toDF("v"), "v")
    val nullBf = RuntimeFilter.bloomOf(
      Seq(Option.empty[String], Option.empty[String]).toDF("v"), "v")
    val probe2 = Seq("x").toDF("v")
    Seq(emptyBf, nullBf).foreach { b =>
      assert(!probe2.select(RuntimeFilter.mightContain(b, col("v")))
        .collect().head.getBoolean(0))
    }
  }

  test("winnow ledger: bucket layout, prescreened span evidence == unprescreened") {
    val root = java.nio.file.Files.createTempDirectory("wledger_fpb").toString
    val ledger = s"$root/winnow"
    WinnowLedger.write(corpus, "doc_id", "text", 4, 3, ledger, "day1")
    // bucket dirs under the ingest partition
    val d = new java.io.File(s"$ledger/wfp")
    val buckets = d.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("fpb="))
    assert(buckets.nonEmpty, "wfp table not bucket-partitioned")

    val hist = WinnowLedger.read(spark, ledger, 4, 3)
    assert(hist.columns.contains("fpb"))
    def evidence(expected: Long, minBytes: Long): Seq[String] =
      Dedup.winnowingMatchesAgainst(hist, probe, "doc_id", "text", 4, 3,
          prescreenExpectedItems = expected,
          prescreenMinHistoryBytes = minBytes)
        .orderBy("batch_id", "pos_b", "hist_id", "pos_h")
        .collect().map(_.toString).toSeq
    val plain = evidence(0L, Long.MaxValue)
    assert(plain.nonEmpty, "fixture produced no span evidence")
    assert(evidence(1L << 16, 0L) == plain,
      "prescreen changed winnow span evidence")

    // compaction preserves the bucket layout and the evidence
    WinnowLedger.write(probe, "doc_id", "text", 4, 3, ledger, "day2")
    WinnowLedger.compact(spark, ledger, 4, 3)
    val buckets2 = d.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("fpb="))
    assert(buckets2.nonEmpty, "compaction dropped the wfp bucket layout")

    // takedown: deleting a history doc removes ITS span evidence only
    val parts = WinnowLedger.delete(spark, ledger,
      Seq(Tuple1(1L)).toDF("doc_id"), 4, 3)
    assert(parts > 0)
    val hist2 = WinnowLedger.read(spark, ledger, 4, 3)
    assert(hist2.filter(col("doc_id") === 1L).count() == 0)
    assert(hist2.filter(col("doc_id") === 2L).count() > 0,
      "delete removed an unrelated doc's evidence")
    // absent ids are a no-op
    assert(WinnowLedger.delete(spark, ledger,
      Seq(Tuple1(999L)).toDF("doc_id"), 4, 3) == 0)
  }

  test("screen plan: history scan is bucket-pruned and bloom-filtered below its exchange") {
    // the screen's fp path localCheckpoints after its join, so the
    // history subplan is materialized out of the RESULT plan — pin the
    // exact frame shape incrementalDedupLedgered builds for fpHist
    // (bucket filter + bloom filter + exact-dup aggregate) instead
    val root = java.nio.file.Files.createTempDirectory("ledger_plan").toString
    val ledger = s"$root/ledger"
    DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
      overwrite = true)
    val (fp, _) = DedupLedger.read(spark, ledger, 3, 8, 2)
    val batchFp = probe.select(
      TextAnalysis.fingerprint(col("text")).as("__fp"))
    val bs = batchFp.select(DedupLedger.fpBucket(col("__fp")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val bloom = RuntimeFilter.bloomOf(batchFp, "__fp", 1L << 16, 0.001)
    val hExact = fp.filter(col("fpb").isInCollection(bs))
      .filter(RuntimeFilter.mightContain(bloom, col("fp")))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("h"))
    hExact.collect()
    val plan = hExact.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val lower = plan.toLowerCase
    // the Bloom gates the history rows BELOW the aggregate's exchange
    // (tree prints top-down: the filter line must come after it)
    assert(lower.contains("bloommightcontain"),
      s"history prescreen missing:\n${plan.take(3000)}")
    val exIdx = lower.indexOf("exchange")
    val blIdx = lower.indexOf("bloommightcontain")
    assert(exIdx == -1 || blIdx > exIdx,
      s"bloom filter not below the exchange:\n${plan.take(3000)}")
    // and the batch's bucket set reaches the fp scan as a partition
    // filter (file-level pruning when the batch touches few buckets)
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("fpb")),
      s"fpb bucket filter did not reach the history scan:\n${plan.take(3000)}")
  }

  test("delete resolves escapable ingest labels to on-disk dirs") {
    // ':' is Hive-escaped in the dir name (-> %3A) and input_file_name()
    // URI-encodes on top (-> %253A); ' ' is only URI-encoded (-> %20).
    // Both classes must decode back to the exact on-disk names or the
    // takedown's staging read fails for that label.
    val root = java.nio.file.Files.createTempDirectory("ledger_esc").toString
    val ledger = s"$root/ledger"
    val label = "GSE0:VCF TEST"
    DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, label,
      overwrite = true)
    val fpDirs = new java.io.File(s"$ledger/fp").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(fpDirs.exists(d => d.contains("%3A") && d.contains(" ")),
      s"expected a Hive-escaped ingest dir, got $fpDirs")
    val (fpParts, bandParts) = DedupLedger.delete(spark, ledger,
      Seq(2L).toDF("doc_id"), 3, 8, 2)
    assert(fpParts > 0 && bandParts > 0)
    val (fp, bands) = DedupLedger.read(spark, ledger, 3, 8, 2)
    assert(fp.filter(col("doc_id") === 2L).isEmpty &&
      bands.filter(col("doc_id") === 2L).isEmpty,
      "escapable-label takedown left ghost rows")
    assert(fp.filter(col("doc_id") === 1L).count() == 1,
      "takedown removed an unrelated doc")

    val wPath = s"$root/winnow"
    WinnowLedger.write(corpus, "doc_id", "text", 5, 4, wPath, label)
    assert(WinnowLedger.delete(spark, wPath, Seq(2L).toDF("doc_id"), 5, 4) > 0)
    val w = WinnowLedger.read(spark, wPath, 5, 4)
    assert(w.filter(col("doc_id") === 2L).isEmpty &&
      w.filter(col("doc_id") === 1L).count() > 0)
  }

  test("compact rolls a crashed delete forward instead of folding the half-swapped tree") {
    import graft.core.PartitionSwap
    def build(ledger: String): Unit = {
      DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
        overwrite = true)
      DedupLedger.write(probe, "doc_id", "text", 3, 8, 2, ledger, "day2")
    }
    def content(ledger: String): (Seq[(Long, String)], Seq[Long]) = {
      val (fp, bands) = DedupLedger.read(spark, ledger, 3, 8, 2)
      (fp.select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted,
        bands.select("doc_id").distinct().collect()
          .map(_.getLong(0)).toSeq.sorted)
    }
    // expected end state: uninterrupted delete, then compact
    val cleanRoot =
      java.nio.file.Files.createTempDirectory("ledger_cd0").toString
    build(s"$cleanRoot/ledger")
    DedupLedger.delete(spark, s"$cleanRoot/ledger", Seq(1L).toDF("doc_id"),
      3, 8, 2)
    DedupLedger.compact(spark, s"$cleanRoot/ledger", 3, 8, 2)
    val want = content(s"$cleanRoot/ledger")

    var ops = 1
    var sawCompletion = false
    var sawPending = false
    while (!sawCompletion && ops < 80) {
      val root =
        java.nio.file.Files.createTempDirectory(s"ledger_cd$ops").toString
      val ledger = s"$root/ledger"
      build(ledger)
      PartitionSwap.testFailAfterOps = Some(ops)
      val killed =
        try { DedupLedger.delete(spark, ledger, Seq(1L).toDF("doc_id"),
            3, 8, 2); false }
        catch { case _: IllegalStateException => true }
        finally PartitionSwap.testFailAfterOps = None
      if (killed) {
        val fsys = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        val pending = PartitionSwap.pending(fsys,
          new org.apache.hadoop.fs.Path(ledger))
        if (pending) sawPending = true
        else // killed before the commit point: the delete did not happen
          DedupLedger.delete(spark, ledger, Seq(1L).toDF("doc_id"), 3, 8, 2)
        // compact must roll the interrupted swap forward FIRST — folding
        // the half-swapped tree would resurrect the retracted doc
        DedupLedger.compact(spark, ledger, 3, 8, 2)
        assert(content(ledger) == want,
          s"kill at op $ops: compact after crashed delete diverged")
        assert(!content(ledger)._1.exists(_._1 == 1L),
          s"kill at op $ops: retracted doc resurrected by compact")
      } else sawCompletion = true
      ops += 1
    }
    assert(sawCompletion && sawPending,
      "sweep never exercised both a pending marker and a clean run")
  }

  test("takedown discovery reads the sidecar, not the history tables") {
    // proof by corruption: trash every parquet file in day1's partitions
    // (the ids being deleted live only in day2) — sidecar discovery +
    // per-partition staging never open them, the pre-sidecar full-scan
    // fallback must and dies
    def build(): String = {
      val root = java.nio.file.Files.createTempDirectory("ledger_sc").toString
      val ledger = s"$root/ledger"
      DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
        overwrite = true)
      DedupLedger.write(probe, "doc_id", "text", 3, 8, 2, ledger, "day2")
      ledger
    }
    def corruptDay1(ledger: String): Unit =
      for (t <- Seq("fp", "bands")) {
        val day1 = new java.io.File(s"$ledger/$t/ingest=day1")
        assert(day1.isDirectory)
        def walk(f: java.io.File): Unit =
          if (f.isDirectory) f.listFiles().foreach(walk)
          else if (f.getName.endsWith(".parquet"))
            java.nio.file.Files.write(f.toPath,
              "not parquet at all".getBytes("UTF-8"))
        walk(day1)
      }
    // day2's docs are the probe ids; 31 is day2-only (30/32 stay so the
    // day2 partitions remain readable after the delete)
    val viaSidecar = build()
    assert(new java.io.File(s"$viaSidecar/dirs/_complete").isFile,
      "bootstrap did not mark the sidecar complete")
    corruptDay1(viaSidecar)
    val (fpP, bandP) = DedupLedger.delete(spark,
      viaSidecar, Seq(31L).toDF("doc_id"), 3, 8, 2)
    assert(fpP > 0 && bandP > 0)
    // the id is gone from its (readable) day2 partitions and the sidecar
    val day2Fp = spark.read.option("basePath", s"$viaSidecar/fp")
      .parquet(new java.io.File(s"$viaSidecar/fp/ingest=day2").listFiles()
        .filter(_.isDirectory).map(_.toString).toSeq: _*)
    assert(day2Fp.filter(col("doc_id") === 31L).isEmpty)
    assert(day2Fp.filter(col("doc_id") === 32L).count() == 1)
    assert(spark.read.parquet(s"$viaSidecar/dirs")
      .filter(col("doc_id") === 31L).isEmpty,
      "sidecar rows for deleted ids survive")

    // the fallback path (sidecar marker removed) must scan history — and
    // hits the corruption, proving what the sidecar avoids
    val viaFallback = build()
    corruptDay1(viaFallback)
    new java.io.File(s"$viaFallback/dirs/_complete").delete()
    intercept[Exception] {
      DedupLedger.delete(spark, viaFallback,
        Seq(31L).toDF("doc_id"), 3, 8, 2)
    }
  }

  test("sidecar and fallback deletes leave identical ledgers; compact keeps the sidecar live") {
    def build(): String = {
      val root = java.nio.file.Files.createTempDirectory("ledger_eq").toString
      val ledger = s"$root/ledger"
      DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
        overwrite = true)
      DedupLedger.write(probe, "doc_id", "text", 3, 8, 2, ledger, "day2")
      ledger
    }
    def content(ledger: String) = {
      val (fp, bands) = DedupLedger.read(spark, ledger, 3, 8, 2)
      (fp.select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted,
        bands.select("doc_id", "band", "band_key").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted)
    }
    val a = build() // sidecar path
    val b = build() // fallback path
    new java.io.File(s"$b/dirs/_complete").delete()
    val ids = Seq(2L, 31L).toDF("doc_id")
    DedupLedger.delete(spark, a, ids, 3, 8, 2)
    DedupLedger.delete(spark, b, ids, 3, 8, 2)
    assert(content(a) == content(b),
      "sidecar-discovered delete diverged from the full-scan delete")

    // compaction relabels the sidecar in lockstep: a post-compact delete
    // still discovers through it (against the folded label dirs)
    DedupLedger.compact(spark, a, 3, 8, 2)
    assert(new java.io.File(s"$a/dirs/_complete").isFile,
      "compaction lost the sidecar-complete marker")
    val labels = spark.read.parquet(s"$a/dirs").select("ingest")
      .distinct().collect().map(_.getString(0)).toSet
    assert(labels == Set("compacted"), s"sidecar labels not folded: $labels")
    val (fpP, _) = DedupLedger.delete(spark, a, Seq(1L).toDF("doc_id"),
      3, 8, 2)
    assert(fpP > 0)
    assert(content(a)._1.forall(_._1 != 1L), "post-compact takedown missed")
  }

  test("winnow sidecar: discovery without a wfp scan, delete scrubs it, compact keeps it") {
    val root = java.nio.file.Files.createTempDirectory("winnow_sc").toString
    val wPath = s"$root/winnow"
    WinnowLedger.write(corpus, "doc_id", "text", 5, 4, wPath, "day1")
    WinnowLedger.write(probe, "doc_id", "text", 5, 4, wPath, "day2")
    assert(new java.io.File(s"$wPath/dirs/_complete").isFile)
    // corrupt day1 (the deleted id lives in day2 only): sidecar
    // discovery + staging must not open it
    val day1 = new java.io.File(s"$wPath/wfp/ingest=day1")
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (f.getName.endsWith(".parquet"))
        java.nio.file.Files.write(f.toPath, "junk".getBytes("UTF-8"))
    walk(day1)
    assert(WinnowLedger.delete(spark, wPath,
      Seq(30L, 31L, 32L).toDF("doc_id"), 5, 4) > 0)
    assert(spark.read.parquet(s"$wPath/dirs")
      .filter(col("doc_id").isin(30L, 31L, 32L)).isEmpty)

    // fresh un-corrupted ledger: compact folds the sidecar labels too
    val w2 = s"$root/winnow2"
    WinnowLedger.write(corpus, "doc_id", "text", 5, 4, w2, "day1")
    WinnowLedger.write(probe, "doc_id", "text", 5, 4, w2, "day2")
    WinnowLedger.compact(spark, w2, 5, 4)
    assert(new java.io.File(s"$w2/dirs/_complete").isFile)
    assert(spark.read.parquet(s"$w2/dirs").select("ingest").distinct()
      .collect().map(_.getString(0)).toSet == Set("compacted"))
    assert(WinnowLedger.delete(spark, w2, Seq(2L).toDF("doc_id"), 5, 4) > 0)
    assert(WinnowLedger.read(spark, w2, 5, 4)
      .filter(col("doc_id") === 2L).isEmpty)
  }

  test("rebucket migration: compact(rebucketTo) moves the fan-out, screens unchanged") {
    val root = java.nio.file.Files.createTempDirectory("ledger_rb").toString
    val ledger = s"$root/ledger"
    DedupLedger.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
      overwrite = true)
    assert(DedupLedger.bucketsOf(ledger) == DedupLedger.Buckets)
    def verdicts(): Map[Long, String] = {
      val (fp, bands) = DedupLedger.read(spark, ledger, 3, 8, 2)
      Dedup.incrementalDedupLedgered(corpus, fp, bands, probe,
          "doc_id", "text", 3, 8, 2, 0.5,
          prescreenMinHistoryBytes = 0L, // force the bucket-set pruning on
          ledgerBuckets = DedupLedger.bucketsOf(ledger))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val before = verdicts()
    assert(before(30L) == "exact" && before(31L) == "near" &&
      before(32L) == "keep", before.toString)

    DedupLedger.compact(spark, ledger, 3, 8, 2, rebucketTo = Some(16))
    assert(DedupLedger.bucketsOf(ledger) == 16, "rebucket did not commit")
    // every bucket dir is inside the new fan-out
    def bucketIds(table: String, c: String): Seq[Int] =
      new java.io.File(s"$ledger/$table").listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith(c + "=")).map(_.split("=")(1).toInt).toSeq
    assert(bucketIds("fp", "fpb").nonEmpty &&
      bucketIds("fp", "fpb").forall(b => b >= 0 && b < 16))
    assert(bucketIds("bands", "bkb").forall(b => b >= 0 && b < 16))
    // screens (with bucket pruning engaged at the NEW fan-out) unchanged
    assert(verdicts() == before, "rebucket changed screen verdicts")
    // appends follow the migrated fan-out; takedowns still land
    DedupLedger.write(probe, "doc_id", "text", 3, 8, 2, ledger, "day2")
    assert(bucketIds("fp", "fpb").forall(b => b >= 0 && b < 16))
    val (fpP, bandP) = DedupLedger.delete(spark, ledger,
      Seq(31L).toDF("doc_id"), 3, 8, 2)
    assert(fpP > 0 && bandP > 0)
    assert(DedupLedger.read(spark, ledger, 3, 8, 2)
      ._1.filter(col("doc_id") === 31L).isEmpty)

    // winnow twin: same migration discipline over the single table
    val wPath = s"$root/winnow"
    WinnowLedger.write(corpus, "doc_id", "text", 5, 4, wPath, "day1")
    val wBefore = WinnowLedger.read(spark, wPath, 5, 4)
      .select("doc_id", "pos", "fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    WinnowLedger.compact(spark, wPath, 5, 4, rebucketTo = Some(16))
    assert(WinnowLedger.bucketsOf(wPath) == 16)
    val wAfter = WinnowLedger.read(spark, wPath, 5, 4)
      .select("doc_id", "pos", "fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    assert(wAfter == wBefore, "winnow rebucket changed evidence rows")
  }

  test("rebucket kill-point sweep: readers refuse mid-migration, recovery commits both trees and params") {
    import graft.operators.{DedupLedger => DL}
    def build(): String = {
      val root = java.nio.file.Files.createTempDirectory("ledger_rbk").toString
      val ledger = s"$root/ledger"
      DL.write(corpus, "doc_id", "text", 3, 8, 2, ledger, "day1",
        overwrite = true)
      DL.write(probe, "doc_id", "text", 3, 8, 2, ledger, "day2")
      ledger
    }
    def content(ledger: String) =
      DL.read(spark, ledger, 3, 8, 2)._1.select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val clean = build()
    DL.compact(spark, clean, 3, 8, 2, rebucketTo = Some(16))
    val want = content(clean)

    var ops = 1
    var sawCompletion = false
    var sawPending = false
    while (!sawCompletion && ops < 60) {
      val ledger = build()
      DL.testFailAfterSwapOps = Some(ops)
      val killed =
        try { DL.compact(spark, ledger, 3, 8, 2, rebucketTo = Some(16))
          false }
        catch { case _: IllegalStateException => true }
        finally DL.testFailAfterSwapOps = None
      if (killed) {
        if (DL.rebucketPending(ledger)) {
          sawPending = true
          // readers refuse the between state (trees/params can disagree)
          intercept[IllegalArgumentException] {
            DL.read(spark, ledger, 3, 8, 2)
          }
          assert(DL.recoverCompact(spark, ledger))
        } else {
          // killed before the commit marker: old ledger fully intact
          assert(DL.bucketsOf(ledger) == DL.Buckets)
          DL.compact(spark, ledger, 3, 8, 2, rebucketTo = Some(16))
        }
        assert(DL.bucketsOf(ledger) == 16,
          s"kill at op $ops: params did not commit")
        assert(content(ledger) == want, s"kill at op $ops: content diverged")
      } else sawCompletion = true
      ops += 1
    }
    assert(sawCompletion && sawPending,
      "sweep never exercised both a pending marker and a clean run")
  }

  test("winnow read has one schema across marker-only and data states") {
    val root = java.nio.file.Files.createTempDirectory("winnow_sch").toString
    // marker-only ledger: the crash window between _params and the first
    // append (format mirrors WinnowLedger.paramsLine)
    val markerOnly = s"$root/marker_only"
    new java.io.File(markerOnly).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$markerOnly/_params"),
      s"k=5|w=4|buckets=${DedupLedger.Buckets}\n".getBytes("UTF-8"))
    val empty = WinnowLedger.read(spark, markerOnly, 5, 4)
    val full = {
      val p = s"$root/with_data"
      WinnowLedger.write(corpus, "doc_id", "text", 5, 4, p, "day1")
      WinnowLedger.read(spark, p, 5, 4)
    }
    assert(empty.columns.toSeq == full.columns.toSeq,
      s"schema drift: ${empty.columns.toSeq} vs ${full.columns.toSeq}")
    // the union a caller would write works across both states
    assert(empty.unionByName(full).count() == full.count())
    assert(empty.select("fpb").isEmpty)
  }
}

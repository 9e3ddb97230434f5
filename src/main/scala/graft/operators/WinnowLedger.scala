package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted winnowing-fingerprint table — the span-evidence companion
  * of [[DedupLedger]]: one (doc_id, pos, fp) row per selected
  * fingerprint of every curated document, Hive-partitioned by ingest
  * label. Built incrementally (each cycle appends its kept docs'
  * fingerprints), consumed by [[Dedup.winnowingMatchesAgainst]] so the
  * per-batch span audit never rescans history text.
  *
  * Same discipline as the dedup ledger: a `_params` marker pins (k, w)
  * — evidence from mismatched selection parameters would be silently
  * empty, so reads re-validate; torn cycles heal by the same anti-join
  * reconcile (fingerprints are pure functions of the text, so healed
  * rows are identical to the ones the crashed cycle would have
  * written). */
object WinnowLedger {

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_params")

  private def fs(path: String) =
    markerPath(path).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def paramsLine(k: Int, w: Int, buckets: Int) =
    s"k=$k|w=$w|buckets=$buckets"

  def exists(path: String): Boolean = fs(path).exists(markerPath(path))

  private def readMarkerLine(path: String): String = {
    val in = fs(path).open(markerPath(path))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** The bucket fan-out this ledger was built with (from `_params`) —
    * a build parameter like [[DedupLedger.bucketsOf]], migratable via
    * `compact(rebucketTo = ...)`. */
  def bucketsOf(path: String): Int = {
    val m = ".*buckets=(\\d+).*".r
    readMarkerLine(path) match {
      case m(b) => b.toInt
      case other => throw new IllegalArgumentException(
        s"no bucket count recorded in _params at $path: '$other'")
    }
  }

  private def validate(path: String, k: Int, w: Int): Unit = {
    val line = readMarkerLine(path)
    val want = paramsLine(k, w, bucketsOf(path))
    require(line == want,
      s"winnow ledger at $path was built with ($line), caller wants " +
        s"($want) — rebuild or match parameters")
  }

  /** Append `docs`' winnowing fingerprints under `ingest`. The `_params`
    * marker is written BEFORE the first parquet append (the DedupLedger
    * torn-write order): a crash between marker and append leaves an
    * empty ledger the reconcile heals completely, while the reverse
    * order would leave marker-less data a later bootstrap re-appends —
    * duplicate rows. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            k: Int, w: Int, path: String, ingest: String,
            buckets: Int = DedupLedger.Buckets): Unit = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val bootstrap = !exists(path)
    // appends follow the recorded fan-out; `buckets` applies at bootstrap
    val b = if (bootstrap) buckets else bucketsOf(path)
    if (!bootstrap) validate(path, k, w)
    else {
      val out = fs(path).create(markerPath(path), true)
      out.write((paramsLine(k, w, b) + "\n").getBytes("UTF-8"))
      out.close()
    }
    // bucket level + REBALANCE: same layout/write discipline as the
    // dedup ledger (DedupLedger.write) — bucket pruning for small
    // batches, no task-x-bucket small-file spray. localCheckpoint: the
    // winnowing pass feeds both the sidecar and the wfp write.
    val wfpFrame = TextAnalysis.winnowFingerprints(docs, idCol, textCol, k, w)
      .withColumnRenamed(idCol, "doc_id")
      .withColumn("ingest", lit(ingest))
      .withColumn("fpb", DedupLedger.fpBucket(col("fp"), b))
      .localCheckpoint()
    // takedown-discovery sidecar FIRST — the DedupLedger.write crash
    // ordering: over-inclusive rows are harmless, missing ones ghost
    if (bootstrap || DedupLedger.sidecarComplete(path)) {
      wfpFrame.select(col("doc_id"), col("ingest"),
          col("fpb").as("bucket")).distinct()
        .withColumn("idb", DedupLedger.idBucket(col("doc_id"), b))
        .hint("rebalance", "idb")
        .write.mode("append").partitionBy("idb").parquet(s"$path/dirs")
      if (bootstrap) {
        val out = fs(path).create(
          new org.apache.hadoop.fs.Path(path, "dirs/_complete"), true)
        try out.write("1\n".getBytes("UTF-8")) finally out.close()
      }
    }
    wfpFrame
      .hint("rebalance", "fpb")
      .write.mode("append").partitionBy("ingest", "fpb").parquet(s"$path/wfp")
  }

  /** Remove documents by id from the wfp table — the winnow half of a
    * takedown ([[DedupLedger.delete]]'s discipline over one table):
    * only the bucket partitions the ids live in are rewritten, commit
    * via [[graft.core.PartitionSwap]]. Returns rewritten partitions. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             k: Int, w: Int): Int = {
    require(exists(path), s"no winnow ledger at $path (missing _params)")
    validate(path, k, w)
    val fsys = fs(path)
    val root = new org.apache.hadoop.fs.Path(path)
    graft.core.PartitionSwap.recover(fsys, root)
    if (!fsys.exists(new org.apache.hadoop.fs.Path(path, "wfp"))) return 0
    val b = bucketsOf(path)
    val idSet = ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .localCheckpoint() // discovery + both staging joins
    // O(batch) discovery on sidecar-complete ledgers (the
    // DedupLedger.delete discipline): read only the id-hash sidecar
    // partitions the ids fall in, resolve labels to on-disk dir names by
    // listing + unescape. Pre-sidecar ledgers fall back to the
    // input_file_name full scan (percentDecode recovers the on-disk
    // name from its URI encoding).
    val (wfpRels, dirRels) =
      if (DedupLedger.sidecarComplete(path)) {
        val idbs = idSet.select(DedupLedger.idBucket(col("doc_id"), b).as("b"))
          .distinct().collect().map(_.getInt(0)).sorted
        val dRels = idbs.map(b => s"dirs/idb=$b")
          .filter(r => fsys.exists(new org.apache.hadoop.fs.Path(root, r)))
          .toSeq
        if (dRels.isEmpty) (Nil, Nil)
        else {
          val hits = spark.read.option("basePath", s"$path/dirs")
            .parquet(dRels.map(r => s"$path/$r"): _*)
            .join(idSet, Seq("doc_id"), "left_semi")
            .select(col("ingest"), col("bucket")).distinct()
            .collect()
          if (hits.isEmpty) (Nil, Nil)
          else {
            val dirMap = fsys.listStatus(
                new org.apache.hadoop.fs.Path(path, "wfp")).toSeq
              .filter(_.isDirectory).map(_.getPath.getName)
              .filter(_.startsWith("ingest="))
              .map(nm => graft.core.Publish.unescapePartVal(
                nm.stripPrefix("ingest=")) -> nm).toMap
            val rels = hits.toSeq.flatMap { r =>
              dirMap.get(r.getString(0)).map(dn =>
                s"wfp/$dn/fpb=${r.getInt(1)}")
            }.filter(rel =>
              fsys.exists(new org.apache.hadoop.fs.Path(root, rel)))
              .distinct.sorted
            (rels, dRels)
          }
        }
      } else {
        val rels0 = spark.read.parquet(s"$path/wfp")
          .select(col("doc_id"), regexp_extract(input_file_name(),
            "/(ingest=[^/]+/fpb=[^/]+)/[^/]+$", 1).as("__rel"))
          .join(idSet, Seq("doc_id"), "left_semi")
          .select(col("__rel")).distinct()
          .collect().map(r => graft.core.PartitionSwap.percentDecode(
            r.getString(0))).sorted.toSeq
        require(rels0.forall(_.nonEmpty),
          "could not resolve wfp partition dirs for deletion")
        (rels0.map(r => s"wfp/$r"), Seq.empty[String])
      }
    val rels = wfpRels ++ dirRels
    if (rels.isEmpty) return 0
    fsys.delete(graft.core.PartitionSwap.tmpRoot(root), true)
    def stage(table: String, tRels: Seq[String], pcols: Seq[String]): Unit =
      if (tRels.nonEmpty)
        spark.read.option("basePath", s"$path/$table")
          .parquet(tRels.map(r => s"$path/$r"): _*)
          .join(idSet, Seq("doc_id"), "left_anti")
          .write.partitionBy(pcols: _*)
          .parquet(new org.apache.hadoop.fs.Path(
            graft.core.PartitionSwap.tmpRoot(root), table).toString)
    stage("wfp", wfpRels, Seq("ingest", "fpb"))
    stage("dirs", dirRels, Seq("idb"))
    graft.core.PartitionSwap.commit(fsys, root, rels)
    wfpRels.size
  }

  /** Finish an interrupted [[delete]] (idempotent). */
  def recoverDelete(spark: SparkSession, path: String): Boolean =
    graft.core.PartitionSwap.recover(fs(path),
      new org.apache.hadoop.fs.Path(path))

  /** The (doc_id, pos, fp[, fpb]) frame, parameters re-validated. A
    * marker with no data yet (the marker-first crash window) reads as
    * empty. The bucket column rides along so the span screen's bucket
    * filter reaches the scan as a PartitionFilter. A pending
    * half-committed [[delete]] is refused loudly. */
  def read(spark: SparkSession, path: String, k: Int, w: Int): DataFrame = {
    require(exists(path), s"no winnow ledger at $path (missing _params)")
    require(!graft.core.PartitionSwap.pending(fs(path),
        new org.apache.hadoop.fs.Path(path)),
      s"winnow ledger at $path has an unfinished delete — run " +
        "WinnowLedger.recoverDelete")
    // mid-rebucket the trees and _params may disagree on the fan-out —
    // refuse loudly (plain compaction stays readable, as before)
    require(!rebucketPending(path),
      s"winnow ledger at $path has an unfinished rebucket — run " +
        "WinnowLedger.recoverCompact")
    validate(path, k, w)
    import spark.implicits._
    if (!fs(path).exists(new org.apache.hadoop.fs.Path(path, "wfp")))
      // same 4-column schema as the data branch: callers that select or
      // union on fpb must behave identically on a marker-only ledger
      Seq.empty[(Long, Long, String)].toDF("doc_id", "pos", "fp")
        .withColumn("fpb", lit(null).cast("int"))
    else
      spark.read.parquet(s"$path/wfp")
        .select(col("doc_id"), col("pos"), col("fp"), col("fpb"))
  }

  /** Re-append fingerprints for corpus docs a torn cycle left out —
    * the [[DedupLedger.reconcile]] anti-join; bootstrap (no ledger yet)
    * is the degenerate heal-everything case. */
  def reconcile(corpus: DataFrame, idCol: String, textCol: String,
                k: Int, w: Int, path: String, ingest: String,
                buckets: Int = DedupLedger.Buckets): Unit = {
    val missing =
      if (!exists(path)) corpus
      else corpus.join(
        read(corpus.sparkSession, path, k, w)
          .select(col("doc_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    if (!missing.isEmpty)
      write(missing, idCol, textCol, k, w, path, ingest, buckets)
  }

  /** The ingest partition labels currently present (from the wfp table's
    * Hive directory layout). */
  def ingestLabels(spark: SparkSession, path: String): Seq[String] = {
    val fsys = fs(path)
    val dir = new org.apache.hadoop.fs.Path(path, "wfp")
    if (!fsys.exists(dir)) Seq.empty
    else fsys.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("ingest="))
      .map(d => graft.core.Publish.unescapePartVal(d.stripPrefix("ingest=")))
      .sorted
  }

  /** Test hook (mirrors [[DedupLedger.testFailAfterSwapOps]]): throw
    * after N filesystem mutations of the compaction commit path. */
  private[graft] var testFailAfterSwapOps: Option[Int] = None
  private val swapOpCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private def swapStep(): Unit = testFailAfterSwapOps.foreach { nOps =>
    if (swapOpCounter.incrementAndGet() > nOps)
      throw new IllegalStateException(s"test kill after $nOps swap ops")
  }

  private def compactingMarker(path: String) =
    new org.apache.hadoop.fs.Path(path, "_compacting")
  private def tmpRoot(path: String) =
    new org.apache.hadoop.fs.Path(path, ".compact-tmp")
  private def oldRoot(path: String) =
    new org.apache.hadoop.fs.Path(path, ".compact-old")

  private def compactingContent(path: String): Option[String] = {
    val fsys = fs(path)
    if (!fsys.exists(compactingMarker(path))) None
    else {
      val in = fsys.open(compactingMarker(path))
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private[operators] def rebucketPending(path: String): Boolean =
    compactingContent(path).exists(_.startsWith("params:"))

  /** Compact the winnow ledger's ingest partitions — the
    * [[DedupLedger.compact]] discipline over the single `wfp` table:
    * every label NOT in `keepLabels` is rewritten into the `into`
    * partition (retention: keep the recent labels you still want
    * individually replayable), with a distinct() collapsing duplicate
    * rows from healed torn writes. Evidence-preserving: fingerprints are
    * pure functions of the text and [[Dedup.winnowingMatchesAgainst]]
    * consumes the row SET, which is unchanged up to the ingest label.
    * `_params` is re-validated before anything is written.
    *
    * Crash-safe like the warehouse publish: the folded table stages
    * under `.compact-tmp/`, a `_compacting` marker commits the swap, the
    * live tree swaps via two renames, and the marker is removed after
    * cleanup. A kill at ANY point either leaves the old ledger live
    * (marker absent — stale tmp deleted on the next attempt) or rolls
    * FORWARD via [[recoverCompact]], which both this method and the
    * curate cycle run first. */
  def compact(spark: SparkSession, path: String, k: Int, w: Int,
              into: String = "compacted",
              keepLabels: Set[String] = Set.empty,
              rebucketTo: Option[Int] = None): Unit = {
    require(into.nonEmpty && !into.contains("/"),
      s"compaction label must be a plain partition value, got '$into'")
    require(rebucketTo.forall(_ > 0),
      s"rebucket count must be positive, got $rebucketTo")
    recoverCompact(spark, path)
    // roll an interrupted DELETE forward before folding — see
    // DedupLedger.compact: folding a half-swapped tree would undo the
    // takedown when the swap marker later rolls forward
    graft.core.PartitionSwap.recover(fs(path),
      new org.apache.hadoop.fs.Path(path))
    require(exists(path), s"no winnow ledger at $path (missing _params)")
    validate(path, k, w)
    val b = bucketsOf(path)
    val b2 = rebucketTo.getOrElse(b)
    val fold = ingestLabels(spark, path).toSet -- keepLabels
    if (b2 == b &&
      (fold.isEmpty || (fold.size == 1 && fold.contains(into)))) return
    val fsys = fs(path)
    fsys.delete(tmpRoot(path), true)
    val relabel = when(col("ingest").isin(fold.toSeq: _*), lit(into))
      .otherwise(col("ingest"))
    spark.read.parquet(s"$path/wfp")
      .select(col("doc_id"), col("pos"), col("fp"), relabel.as("ingest"))
      .distinct()
      .withColumn("fpb", DedupLedger.fpBucket(col("fp"), b2))
      .hint("rebalance", "ingest", "fpb")
      .write.partitionBy("ingest", "fpb")
      .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "wfp").toString)
    // takedown sidecar rebuilt from the staged tree (see
    // DedupLedger.compact — bucket values recompute at the target
    // fan-out from the keys, which the sidecar does not carry)
    if (DedupLedger.sidecarComplete(path)) {
      spark.read.parquet(
          new org.apache.hadoop.fs.Path(tmpRoot(path), "wfp").toString)
        .select(col("doc_id"), col("ingest"),
          DedupLedger.fpBucket(col("fp"), b2).as("bucket"))
        .distinct()
        .withColumn("idb", DedupLedger.idBucket(col("doc_id"), b2))
        .hint("rebalance", "idb")
        .write.partitionBy("idb")
        .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "dirs").toString)
      val out = fsys.create(new org.apache.hadoop.fs.Path(
        tmpRoot(path), "dirs/_complete"), true)
      try out.write("1\n".getBytes("UTF-8")) finally out.close()
    }
    // the marker is the commit point: from here a crash rolls FORWARD;
    // a rebucket records the new _params line in it (DedupLedger.compact)
    val markerBody =
      if (b2 != b) "params:" + paramsLine(k, w, b2) else "1"
    swapOpCounter.set(0)
    swapStep()
    val out = fsys.create(compactingMarker(path), true)
    try out.write((markerBody + "\n").getBytes("UTF-8")) finally out.close()
    swapStaged(fsys, path)
  }

  /** Finish (roll forward) an interrupted [[compact]]. Idempotent and
    * cheap on a clean ledger. Returns true if an unfinished compaction
    * was completed. */
  def recoverCompact(spark: SparkSession, path: String): Boolean = {
    val fsys = fs(path)
    if (!fsys.exists(compactingMarker(path))) {
      fsys.delete(tmpRoot(path), true)
      fsys.delete(oldRoot(path), true)
      false
    } else {
      swapStaged(fsys, path)
      true
    }
  }

  private def swapStaged(fsys: org.apache.hadoop.fs.FileSystem,
                         path: String): Unit = {
    // a rebucket recorded the new _params line in the marker — read it
    // BEFORE any deletion so every resume sees it
    val newParams = compactingContent(path).filter(_.startsWith("params:"))
      .map(_.stripPrefix("params:"))
    fsys.mkdirs(oldRoot(path))
    for (t <- Seq("wfp", "dirs")) {
      val live = new org.apache.hadoop.fs.Path(path, t)
      val tmp = new org.apache.hadoop.fs.Path(tmpRoot(path), t)
      val old = new org.apache.hadoop.fs.Path(oldRoot(path), t)
      if (fsys.exists(tmp)) {
        if (fsys.exists(live)) {
          swapStep(); fsys.delete(old, true)
          swapStep(); fsys.rename(live, old)
        }
        swapStep(); fsys.rename(tmp, live)
      }
      // tmp absent: already swapped in a previous attempt
    }
    // _params flips while the marker still exists (idempotent on rerun)
    newParams.foreach { line =>
      swapStep()
      val out = fsys.create(markerPath(path), true)
      try out.write((line + "\n").getBytes("UTF-8")) finally out.close()
    }
    swapStep(); fsys.delete(oldRoot(path), true)
    swapStep(); fsys.delete(tmpRoot(path), true)
    swapStep(); fsys.delete(compactingMarker(path), false)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted history side of incremental dedup — the production
  * ledger [[Dedup.incrementalDedupLedgered]] consumes.
  *
  * Both ledger tables are pure functions of each kept document's text:
  *
  *  - `fp/`    — (doc_id, fp): the whitespace-normalized md5 fingerprint
  *               ([[TextAnalysis.fingerprint]]), one row per doc;
  *  - `bands/` — (doc_id, band, band_key): the MinHash LSH band keys
  *               ([[Dedup.bandFrame]]), numHashes/rowsPerBand rows per
  *               doc (docs too short to shingle have none, exactly like
  *               the recompute form).
  *
  * Layout: Hive-partitioned by `ingest` (the batch label) and, within
  * each ingest, by hash bucket — `fpb=pmod(xxhash64(fp), Buckets)` on
  * the fp table, `bkb=pmod(xxhash64(band, band_key), Buckets)` on the
  * bands table. Each screened batch APPENDS one new ingest partition
  * for its kept docs (replays/backouts of a bad ingest day prune by
  * label); the bucket level lets a SMALL batch's screen prune history
  * FILES by its bucket set, and pre-co-locates the tables for any
  * storage-partitioned-join reader. At 100 TB of history the ledger is
  * what turns the per-batch screen from a full history shingle+MinHash
  * rescan into parquet scans of two narrow tables whose size is
  * rows-per-doc-bounded — and the screen's Bloom prescreen
  * ([[Dedup.incrementalDedupLedgered]]) keeps the history EXCHANGE
  * bounded by matches + fpp, not |history|.
  *
  * The LSH parameters (n, numHashes, rowsPerBand) and the bucket count
  * are baked into the rows/layout — a ledger is only valid for the
  * parameters it was built with, so they are recorded in a `_params`
  * marker file at write time and re-validated on read (a pre-bucketing
  * ledger fails the params check: rebuild with overwrite). */
object DedupLedger {

  /** (doc_id, fp) for a set of kept documents — one narrow projection. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))

  /** (doc_id, band, band_key) for a set of kept documents. */
  def bands(docs: DataFrame, idCol: String, textCol: String,
            n: Int, numHashes: Int, rowsPerBand: Int): DataFrame =
    Dedup.bandFrame(docs, idCol, textCol, n, numHashes, rowsPerBand,
      checkpointSig = false)

  // The marker resolves through the Hadoop FileSystem of the ledger
  // path's URI — the SAME filesystem the parquet writes use — so an
  // hdfs:// or s3a:// ledger validates against a marker next to its
  // data, not a bogus local path (local paths behave as before).
  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_params")

  private def markerFs(path: String) =
    markerPath(path).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def readMarker(path: String): String = {
    val in = markerFs(path).open(markerPath(path))
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
    finally in.close()
  }

  private def writeMarker(path: String, line: String): Unit = {
    val out = markerFs(path).create(markerPath(path), true)
    try out.write((line + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def markerExists(path: String): Boolean =
    markerFs(path).isFile(markerPath(path))

  /** Hash-bucket fan-out of the fp and band tables' second partition
    * level (`fpb=` / `bkb=` under each `ingest=`). Layout-only — bucket
    * ids are `pmod(xxhash64(key), Buckets)`, never compared cross-engine
    * — but recorded in `_params` because a screen prunes history
    * directories by the BATCH's bucket set: a small batch (replay,
    * backfill, trickle ingest) touches few buckets and the scan skips
    * the rest of the history's FILES outright. Big batches hit all
    * buckets; their history-exchange bound comes from the Bloom
    * prescreen ([[Dedup.incrementalDedupLedgered]]), not pruning. */
  val Buckets = 64

  private[operators] def fpBucket(fp: org.apache.spark.sql.Column) =
    pmod(xxhash64(fp), lit(Buckets.toLong)).cast("int")

  private[operators] def bandBucket(band: org.apache.spark.sql.Column,
                                    bandKey: org.apache.spark.sql.Column) =
    pmod(xxhash64(band, bandKey), lit(Buckets.toLong)).cast("int")

  private def paramsLine(n: Int, numHashes: Int, rowsPerBand: Int) =
    s"n=$n numHashes=$numHashes rowsPerBand=$rowsPerBand buckets=$Buckets"

  /** Write (or append) the ledger rows for `docs` under `path`, tagged
    * with the `ingest` partition label. `overwrite = true` rebuilds the
    * whole ledger (bootstrap); the default appends one new ingest
    * partition — the shape of a daily batch screen adding its kept docs.
    * One pass: the MinHash signature behind the band rows is computed
    * once per doc here and never again for any later batch. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            n: Int, numHashes: Int, rowsPerBand: Int,
            path: String, ingest: String,
            overwrite: Boolean = false): Unit = {
    require(ingest.nonEmpty && !ingest.contains("/"),
      s"ingest label must be a plain partition value, got '$ingest'")
    val mode = if (overwrite) "overwrite" else "append"
    val line = paramsLine(n, numHashes, rowsPerBand)
    if (markerExists(path) && !overwrite) {
      val existing = readMarker(path)
      require(existing == line,
        s"ledger at $path was built with '$existing'; refusing to append " +
          s"rows built with '$line' — rebuild with overwrite = true")
    }
    // bands BEFORE fp: a crash between the two writes then leaves a doc
    // with bands but no fingerprint row, and [[reconcile]] — which keys
    // on fp presence — re-appends it. (The reverse order would leave
    // fp-present/bands-torn docs indistinguishable from legitimately
    // shingle-less ones.) Duplicate ledger rows from a healed torn write
    // are harmless by construction: the exact stage takes min() per fp
    // and the candidate stage distinct()s pairs.
    // REBALANCE on the bucket column ahead of the partitioned write:
    // without it every write task holds a file open per bucket it sees
    // (tasks x Buckets tiny files — measured 5x slower ledger READS at
    // gate scale); with it AQE groups rows by bucket and still SPLITS a
    // bucket that outgrows the advisory partition size, so a 100 TB
    // batch keeps write parallelism. Degrades to a plain hash
    // repartition with AQE off.
    bands(docs, idCol, textCol, n, numHashes, rowsPerBand)
      .withColumn("ingest", lit(ingest))
      .withColumn("bkb", bandBucket(col("band"), col("band_key")))
      .hint("rebalance", "bkb")
      .write.mode(mode).partitionBy("ingest", "bkb").parquet(s"$path/bands")
    fingerprints(docs, idCol, textCol)
      .withColumn("ingest", lit(ingest))
      .withColumn("fpb", fpBucket(col("fp")))
      .hint("rebalance", "fpb")
      .write.mode(mode).partitionBy("ingest", "fpb").parquet(s"$path/fp")
    writeMarker(path, line)
  }

  /** Self-heal the ledger against its corpus: any corpus doc with no
    * fingerprint row (a torn ingest — crash between the corpus append
    * and the ledger append, or between the ledger's two table writes)
    * gets its rows re-appended under the `ingest` label. Cost is one
    * narrow anti-join (corpus ids vs ledger ids) plus the recompute for
    * the healed docs ONLY — so calling it at the top of every cycle is
    * cheap insurance, which is what [[graft.CurateCli.runCycle]] does.
    * Returns the number of healed docs (0 on a consistent ledger). */
  def reconcile(corpus: DataFrame, idCol: String, textCol: String,
                n: Int, numHashes: Int, rowsPerBand: Int,
                path: String, ingest: String = "reconciled"): Long = {
    val spark = corpus.sparkSession
    if (!exists(path)) { // bootstrap counts as healing everything
      write(corpus, idCol, textCol, n, numHashes, rowsPerBand, path,
        ingest, overwrite = true)
      return corpus.count()
    }
    val (fp, _) = read(spark, path, n, numHashes, rowsPerBand)
    val missing = corpus.join(
        fp.select(col("doc_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
      .localCheckpoint() // consumed by the count and both ledger writes
    val healed = missing.count()
    if (healed > 0)
      write(missing, idCol, textCol, n, numHashes, rowsPerBand, path, ingest)
    healed
  }

  /** Remove documents by id from BOTH ledger tables — the takedown /
    * right-to-be-forgotten path: without it a retracted document keeps
    * ghost-matching future batches (its fingerprints and bands stay in
    * history forever). Only the bucket partitions the ids actually live
    * in are re-read and rewritten (discovered via `input_file_name` on
    * a doc_id semi-join, URI-decoded back to the on-disk names);
    * commit is the [[graft.core.PartitionSwap]] marker discipline
    * (swap-vs-drop recorded up front, kill rolls FORWARD). Returns the
    * rewritten (fpPartitions, bandPartitions). */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             n: Int, numHashes: Int, rowsPerBand: Int): (Int, Int) = {
    val line = paramsLine(n, numHashes, rowsPerBand)
    val existing = readMarker(path)
    require(existing == line,
      s"ledger at $path was built with '$existing', delete asked for '$line'")
    val fsys = markerFs(path)
    val root = new org.apache.hadoop.fs.Path(path)
    graft.core.PartitionSwap.recover(fsys, root)
    val idSet = ids.select(col(ids.columns.head).as("doc_id")).distinct()
    def affected(table: String, bucketCol: String): Seq[String] = {
      // filename projected BEFORE the join: input_file_name() is only
      // defined inside the scan's stage — after a shuffled join it
      // evaluates empty and the rel extraction would silently miss
      // input_file_name() URI-encodes the on-disk name (space -> %20, a
      // Hive-escaped ':' -> %253A) — decode ONCE to recover the exact
      // directory name, or the staging read of $path/$rel misses
      val rels = spark.read.parquet(s"$path/$table")
        .select(col("doc_id"), regexp_extract(input_file_name(),
          s"/(ingest=[^/]+/$bucketCol=[^/]+)/[^/]+$$", 1).as("__rel"))
        .join(idSet, Seq("doc_id"), "left_semi")
        .select(col("__rel")).distinct()
        .collect().map(r => graft.core.PartitionSwap.percentDecode(
          r.getString(0))).sorted.toSeq
      require(rels.forall(_.nonEmpty),
        s"could not resolve $table partition dirs for deletion")
      rels.map(r => s"$table/$r")
    }
    val fpRels = affected("fp", "fpb")
    val bandRels = affected("bands", "bkb")
    val rels = fpRels ++ bandRels
    if (rels.isEmpty) return (0, 0)
    fsys.delete(graft.core.PartitionSwap.tmpRoot(root), true)
    def stage(table: String, tRels: Seq[String], pcols: Seq[String]): Unit =
      if (tRels.nonEmpty)
        spark.read.option("basePath", s"$path/$table")
          .parquet(tRels.map(r => s"$path/$r"): _*)
          .join(idSet, Seq("doc_id"), "left_anti")
          .write.partitionBy(pcols: _*)
          .parquet(new org.apache.hadoop.fs.Path(
            graft.core.PartitionSwap.tmpRoot(root), table).toString)
    stage("fp", fpRels, Seq("ingest", "fpb"))
    stage("bands", bandRels, Seq("ingest", "bkb"))
    graft.core.PartitionSwap.commit(fsys, root, rels)
    (fpRels.size, bandRels.size)
  }

  /** Finish an interrupted [[delete]] (idempotent; [[delete]] and the
    * curate cycle run it first). */
  def recoverDelete(spark: SparkSession, path: String): Boolean =
    graft.core.PartitionSwap.recover(markerFs(path),
      new org.apache.hadoop.fs.Path(path))

  /** Read the ledger back as the two frames
    * [[Dedup.incrementalDedupLedgered]] takes, validating that the LSH
    * parameters match what the ledger was built with. The `ingest`
    * partition column is dropped — verdicts do not depend on which batch
    * kept a history doc — but the bucket columns (`fpb`/`bkb`) ride
    * along so the screen's bucket-set filter reaches the scan as a
    * PartitionFilter (file-level pruning for small batches). A pending
    * half-committed [[delete]] is refused loudly (some partitions
    * swapped, some not — reading it would be silently wrong); recovery
    * is a writer's job under the cycle lock. */
  def read(spark: SparkSession, path: String,
           n: Int, numHashes: Int, rowsPerBand: Int): (DataFrame, DataFrame) = {
    require(markerExists(path), s"no ledger at $path (missing _params)")
    require(!graft.core.PartitionSwap.pending(markerFs(path),
        new org.apache.hadoop.fs.Path(path)),
      s"ledger at $path has an unfinished delete — run DedupLedger.recoverDelete")
    val existing = readMarker(path)
    val line = paramsLine(n, numHashes, rowsPerBand)
    require(existing == line,
      s"ledger at $path was built with '$existing', screen asked for '$line'")
    (spark.read.parquet(s"$path/fp").select(col("doc_id"), col("fp"),
        col("fpb")),
      spark.read.parquet(s"$path/bands")
        .select(col("doc_id"), col("band"), col("band_key"), col("bkb")))
  }

  /** Does a ledger exist at `path`? (The CLI bootstraps one when not.) */
  def exists(path: String): Boolean = markerExists(path)

  /** The ingest partition labels currently present (from the fp table's
    * Hive directory layout — both tables are written together). */
  def ingestLabels(spark: SparkSession, path: String): Seq[String] = {
    val fsys = markerFs(path)
    val fpDir = new org.apache.hadoop.fs.Path(path, "fp")
    if (!fsys.exists(fpDir)) Seq.empty
    else fsys.listStatus(fpDir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("ingest="))
      .map(d => graft.core.Publish.unescapePartVal(d.stripPrefix("ingest=")))
      .sorted
  }

  /** Test hook (mirrors [[graft.core.Publish.testFailAfterCommits]]):
    * throw after N filesystem mutations of the compaction commit path to
    * simulate a mid-swap kill. Reset by [[compact]] at entry. */
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

  /** Compact the ledger's ingest partitions: every label NOT in
    * `keepLabels` is rewritten into the single `into` partition; kept
    * labels carry over unchanged. Daily batch screens append one ingest
    * partition each, so at production cadence the two ledger tables
    * small-file into hundreds of directories — compaction folds the old
    * tail into one partition (retention: pass the recent labels you
    * still want individually replayable/backout-able as `keepLabels`).
    *
    * Verdict-preserving by construction: the row SET is unchanged up to
    * the ingest label (plus a distinct() that collapses duplicate rows
    * left by healed torn writes — harmless either way, since the exact
    * stage takes min() per fp and the candidate stage distinct()s
    * pairs). `_params` is re-validated against the caller's LSH
    * parameters before anything is written.
    *
    * Crash-safe like the warehouse publish: both tables stage under
    * `.compact-tmp/` first, a `_compacting` marker commits the swap, the
    * live trees swap via two renames each, and the marker is removed
    * after cleanup. A kill at ANY point either leaves the old ledger
    * live (marker absent — stale tmp is deleted on the next attempt) or
    * is rolled FORWARD by [[recoverCompact]], which both this method and
    * the curate cycle run first. */
  def compact(spark: SparkSession, path: String,
              n: Int, numHashes: Int, rowsPerBand: Int,
              into: String = "compacted",
              keepLabels: Set[String] = Set.empty): Unit = {
    require(into.nonEmpty && !into.contains("/"),
      s"compaction label must be a plain partition value, got '$into'")
    recoverCompact(spark, path)
    // a DELETE that died mid-commit leaves the PartitionSwap marker with
    // some partitions swapped and some not — folding that half-swapped
    // tree would bake the retracted rows into the compacted partition
    // and the marker's later roll-forward would resurrect stale dirs,
    // silently undoing the takedown. Roll it forward first.
    graft.core.PartitionSwap.recover(markerFs(path),
      new org.apache.hadoop.fs.Path(path))
    val line = paramsLine(n, numHashes, rowsPerBand)
    val existing = readMarker(path)
    require(existing == line,
      s"ledger at $path was built with '$existing', compact asked for '$line'")
    val fold = ingestLabels(spark, path).toSet -- keepLabels
    // nothing to fold: no labels, or only the previous compaction output
    if (fold.isEmpty || (fold.size == 1 && fold.contains(into))) return
    val fsys = markerFs(path)
    fsys.delete(tmpRoot(path), true)
    val relabel = when(col("ingest").isin(fold.toSeq: _*), lit(into))
      .otherwise(col("ingest"))
    // distinct over the relabeled rows: folding cannot create duplicates
    // that were not already logically present (healed torn writes). The
    // bucket columns are pure functions of the keys, so recomputing them
    // preserves the recorded `buckets=` layout exactly.
    spark.read.parquet(s"$path/bands")
      .select(col("doc_id"), col("band"), col("band_key"), relabel.as("ingest"))
      .distinct()
      .withColumn("bkb", bandBucket(col("band"), col("band_key")))
      .hint("rebalance", "ingest", "bkb")
      .write.partitionBy("ingest", "bkb")
      .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "bands").toString)
    spark.read.parquet(s"$path/fp")
      .select(col("doc_id"), col("fp"), relabel.as("ingest"))
      .distinct()
      .withColumn("fpb", fpBucket(col("fp")))
      .hint("rebalance", "ingest", "fpb")
      .write.partitionBy("ingest", "fpb")
      .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "fp").toString)
    // the marker is the commit point: from here a crash rolls FORWARD
    swapOpCounter.set(0)
    swapStep()
    val out = fsys.create(compactingMarker(path), true)
    try out.write("1\n".getBytes("UTF-8")) finally out.close()
    swapStaged(fsys, path)
  }

  /** Finish (roll forward) an interrupted [[compact]]. Idempotent and
    * cheap on a clean ledger; [[compact]] and the curate cycle call it
    * first, mirroring the warehouse publish recovery. Returns true if an
    * unfinished compaction was completed. */
  def recoverCompact(spark: SparkSession, path: String): Boolean = {
    val fsys = markerFs(path)
    if (!fsys.exists(compactingMarker(path))) {
      // crash during staging: live trees untouched, tmp is garbage
      fsys.delete(tmpRoot(path), true)
      fsys.delete(oldRoot(path), true)
      false
    } else {
      swapStaged(fsys, path)
      true
    }
  }

  /** The swap itself, resumable from any kill point: per table, if a
    * staged tree exists it becomes live (parking any current live tree
    * under `.compact-old/` first); then old trees, tmp root and the
    * `_compacting` marker are removed. */
  private def swapStaged(fsys: org.apache.hadoop.fs.FileSystem,
                         path: String): Unit = {
    fsys.mkdirs(oldRoot(path))
    for (t <- Seq("bands", "fp")) {
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
      // tmp absent: this table already swapped in a previous attempt
    }
    swapStep(); fsys.delete(oldRoot(path), true)
    swapStep(); fsys.delete(tmpRoot(path), true)
    swapStep(); fsys.delete(compactingMarker(path), false)
  }
}

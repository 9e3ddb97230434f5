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
    * ids are `pmod(xxhash64(key), buckets)`, never compared cross-engine
    * — but recorded in `_params` because a screen prunes history
    * directories by the BATCH's bucket set: a small batch (replay,
    * backfill, trickle ingest) touches few buckets and the scan skips
    * the rest of the history's FILES outright. Big batches hit all
    * buckets; their history-exchange bound comes from the Bloom
    * prescreen ([[Dedup.incrementalDedupLedgered]]), not pruning.
    *
    * The fan-out is a BUILD parameter: `Buckets` is only the bootstrap
    * default. Appends, reads, deletes and screens derive the live count
    * from `_params` ([[bucketsOf]]) — 64 buckets over years of 100 TB
    * history means arbitrarily large per-bucket partitions, so a grown
    * ledger migrates with `compact(rebucketTo = Some(n))`: one
    * crash-safe rewrite, no from-scratch rebuild. */
  val Buckets = 64

  /** The bucket count this ledger was built with (from `_params`). */
  def bucketsOf(path: String): Int = {
    val m = ".*buckets=(\\d+).*".r
    readMarker(path) match {
      case m(b) => b.toInt
      case other => throw new IllegalArgumentException(
        s"no bucket count recorded in _params at $path: '$other'")
    }
  }

  private[operators] def fpBucket(fp: org.apache.spark.sql.Column,
                                  buckets: Int = Buckets) =
    pmod(xxhash64(fp), lit(buckets.toLong)).cast("int")

  private[operators] def bandBucket(band: org.apache.spark.sql.Column,
                                    bandKey: org.apache.spark.sql.Column,
                                    buckets: Int = Buckets) =
    pmod(xxhash64(band, bandKey), lit(buckets.toLong)).cast("int")

  private def paramsLine(n: Int, numHashes: Int, rowsPerBand: Int,
                         buckets: Int = Buckets) =
    s"n=$n numHashes=$numHashes rowsPerBand=$rowsPerBand buckets=$buckets"

  /** The takedown-discovery sidecar: `dirs/` maps doc_id -> every
    * (table, ingest, bucket) partition the doc's ledger rows live in,
    * itself partitioned by `idb=pmod(xxhash64(doc_id), Buckets)` so a
    * takedown reads only the id-hash partitions its ids fall in —
    * discovery becomes O(batch), never a scan of the full fp/bands
    * history ([[delete]] falls back to the input_file_name scan on
    * ledgers that predate the sidecar). Written BEFORE the data tables
    * (a crash leaves over-inclusive sidecar rows, which only cost a
    * harmless extra partition rewrite — the reverse order would leave
    * rows the takedown cannot find: ghosts). `dirs/_complete` marks a
    * ledger whose every row is tracked; appends to a pre-sidecar ledger
    * skip tracking so a partially-covered sidecar is never trusted. */
  private[operators] def idBucket(id: org.apache.spark.sql.Column,
                                  buckets: Int = Buckets) =
    pmod(xxhash64(id), lit(buckets.toLong)).cast("int")

  private def completeMarker(path: String) =
    new org.apache.hadoop.fs.Path(path, "dirs/_complete")

  private[operators] def sidecarComplete(path: String): Boolean =
    markerFs(path).isFile(completeMarker(path))

  /** Write (or append) the ledger rows for `docs` under `path`, tagged
    * with the `ingest` partition label. `overwrite = true` rebuilds the
    * whole ledger (bootstrap); the default appends one new ingest
    * partition — the shape of a daily batch screen adding its kept docs.
    * One pass: the MinHash signature behind the band rows is computed
    * once per doc here and never again for any later batch. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            n: Int, numHashes: Int, rowsPerBand: Int,
            path: String, ingest: String,
            overwrite: Boolean = false,
            buckets: Int = Buckets): Unit = {
    require(ingest.nonEmpty && !ingest.contains("/"),
      s"ingest label must be a plain partition value, got '$ingest'")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val mode = if (overwrite) "overwrite" else "append"
    // appends follow the ledger's RECORDED fan-out; `buckets` only
    // applies at bootstrap (rebucket an existing ledger via compact)
    val b = if (markerExists(path) && !overwrite) bucketsOf(path) else buckets
    val line = paramsLine(n, numHashes, rowsPerBand, b)
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
    // localCheckpoint: the MinHash pass behind the band rows is computed
    // once and feeds BOTH the sidecar and the bands write.
    val bandFrame = bands(docs, idCol, textCol, n, numHashes, rowsPerBand)
      .withColumn("ingest", lit(ingest))
      .withColumn("bkb", bandBucket(col("band"), col("band_key"), b))
      .localCheckpoint()
    val fpFrame = fingerprints(docs, idCol, textCol)
      .withColumn("ingest", lit(ingest))
      .withColumn("fpb", fpBucket(col("fp"), b))
      .localCheckpoint()
    // sidecar FIRST (see [[idBucket]]'s scaladoc for the crash ordering)
    if (overwrite || sidecarComplete(path)) {
      bandFrame.select(col("doc_id"), lit("bands").as("table"),
          col("ingest"), col("bkb").as("bucket")).distinct()
        .unionByName(fpFrame.select(col("doc_id"), lit("fp").as("table"),
          col("ingest"), col("fpb").as("bucket")).distinct())
        .withColumn("idb", idBucket(col("doc_id"), b))
        .hint("rebalance", "idb")
        .write.mode(mode).partitionBy("idb").parquet(s"$path/dirs")
      if (overwrite) {
        val out = markerFs(path).create(completeMarker(path), true)
        try out.write("1\n".getBytes("UTF-8")) finally out.close()
      }
    }
    bandFrame
      .hint("rebalance", "bkb")
      .write.mode(mode).partitionBy("ingest", "bkb").parquet(s"$path/bands")
    fpFrame
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
                path: String, ingest: String = "reconciled",
                buckets: Int = Buckets): Long = {
    val spark = corpus.sparkSession
    if (!exists(path)) { // bootstrap counts as healing everything
      write(corpus, idCol, textCol, n, numHashes, rowsPerBand, path,
        ingest, overwrite = true, buckets = buckets)
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
    val b = bucketsOf(path)
    val line = paramsLine(n, numHashes, rowsPerBand, b)
    val existing = readMarker(path)
    require(existing == line,
      s"ledger at $path was built with '$existing', delete asked for '$line'")
    val fsys = markerFs(path)
    val root = new org.apache.hadoop.fs.Path(path)
    graft.core.PartitionSwap.recover(fsys, root)
    val idSet = ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .localCheckpoint() // consumed by discovery + every staging join
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
    // O(batch) discovery on sidecar-complete ledgers: only the id-hash
    // sidecar partitions the retracted ids fall in are read — the full
    // fp/bands tables are never scanned. Ingest labels resolve to their
    // on-disk (Hive-escaped) dir names by LISTING + unescape, never by
    // re-escaping. Pre-sidecar ledgers fall back to the full-scan path.
    def viaSidecar(): (Seq[String], Seq[String], Seq[String]) = {
      val idbs = idSet.select(idBucket(col("doc_id"), b).as("b"))
        .distinct().collect().map(_.getInt(0)).sorted // bounded <= b
      val dirRels = idbs.map(b => s"dirs/idb=$b")
        .filter(r => fsys.exists(new org.apache.hadoop.fs.Path(root, r)))
        .toSeq
      if (dirRels.isEmpty) return (Nil, Nil, Nil)
      val hits = spark.read.option("basePath", s"$path/dirs")
        .parquet(dirRels.map(r => s"$path/$r"): _*)
        .join(idSet, Seq("doc_id"), "left_semi")
        .select(col("table"), col("ingest"), col("bucket")).distinct()
        .collect() // bounded: <= |ids| x (bands-per-doc + 1) dirs
      if (hits.isEmpty) return (Nil, Nil, Nil)
      def labelDirs(table: String): Map[String, String] = {
        val d = new org.apache.hadoop.fs.Path(root, table)
        if (!fsys.exists(d)) Map.empty
        else fsys.listStatus(d).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("ingest="))
          .map(nm => graft.core.Publish.unescapePartVal(
            nm.stripPrefix("ingest=")) -> nm).toMap
      }
      val dirMaps = Map("fp" -> labelDirs("fp"), "bands" -> labelDirs("bands"))
      val bucketColOf = Map("fp" -> "fpb", "bands" -> "bkb")
      def relsOf(table: String): Seq[String] = hits.toSeq
        .filter(_.getString(0) == table)
        .flatMap { r =>
          dirMaps(table).get(r.getString(1)).map(dn =>
            s"$table/$dn/${bucketColOf(table)}=${r.getInt(2)}")
        }
        // over-inclusive sidecar rows (torn write) may name dirs that
        // were never written — skip them
        .filter(rel => fsys.exists(new org.apache.hadoop.fs.Path(root, rel)))
        .distinct.sorted
      (relsOf("fp"), relsOf("bands"), dirRels)
    }
    val (fpRels, bandRels, dirRels) =
      if (sidecarComplete(path)) viaSidecar()
      else (affected("fp", "fpb"), affected("bands", "bkb"), Seq.empty[String])
    val rels = fpRels ++ bandRels ++ dirRels
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
    // the sidecar's own rows for the retracted ids go in the SAME commit
    stage("dirs", dirRels, Seq("idb"))
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
    // a crashed REBUCKET is mid-layout-change: trees may be on the new
    // fan-out while _params still records the old — a screen's bucket
    // pruning would then silently miss. Plain compaction (no params
    // change) stays readable mid-recovery, as before.
    require(!rebucketPending(path),
      s"ledger at $path has an unfinished rebucket — run " +
        "DedupLedger.recoverCompact")
    val existing = readMarker(path)
    val line = paramsLine(n, numHashes, rowsPerBand, bucketsOf(path))
    require(existing == line,
      s"ledger at $path was built with '$existing', screen asked for '$line'")
    // Partition discovery over the bucket fan-out (b x ingest-label
    // directories) trips Spark's distributed-listing path at its default
    // 32-path threshold, costing one near-empty 64-task job PER TABLE per
    // screen (r16 profile: 2 x ~0.17 s of pure scheduling at test SF).
    // Up to 1024 directories the driver's own listing thread pool is
    // strictly cheaper on any filesystem, so raise the threshold to 1024
    // for these two reads only; past that (many ingest labels x buckets)
    // the distributed listing returns — the knob stays scale-adaptive.
    val tkey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val oldT = spark.conf.get(tkey)
    spark.conf.set(tkey, "1024")
    try {
      (spark.read.parquet(s"$path/fp").select(col("doc_id"), col("fp"),
          col("fpb")),
        spark.read.parquet(s"$path/bands")
          .select(col("doc_id"), col("band"), col("band_key"), col("bkb")))
    } finally spark.conf.set(tkey, oldT)
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

  private def compactingContent(path: String): Option[String] = {
    val fsys = markerFs(path)
    if (!fsys.exists(compactingMarker(path))) None
    else {
      val in = fsys.open(compactingMarker(path))
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Is an unfinished REBUCKET pending (a `_compacting` marker that
    * records a params change)? Readers refuse this state — the trees
    * and `_params` may disagree on the fan-out mid-recovery. */
  private[operators] def rebucketPending(path: String): Boolean =
    compactingContent(path).exists(_.startsWith("params:"))

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
              keepLabels: Set[String] = Set.empty,
              rebucketTo: Option[Int] = None): Unit = {
    require(into.nonEmpty && !into.contains("/"),
      s"compaction label must be a plain partition value, got '$into'")
    require(rebucketTo.forall(_ > 0),
      s"rebucket count must be positive, got $rebucketTo")
    recoverCompact(spark, path)
    // a DELETE that died mid-commit leaves the PartitionSwap marker with
    // some partitions swapped and some not — folding that half-swapped
    // tree would bake the retracted rows into the compacted partition
    // and the marker's later roll-forward would resurrect stale dirs,
    // silently undoing the takedown. Roll it forward first.
    graft.core.PartitionSwap.recover(markerFs(path),
      new org.apache.hadoop.fs.Path(path))
    val b = bucketsOf(path)
    val line = paramsLine(n, numHashes, rowsPerBand, b)
    val existing = readMarker(path)
    require(existing == line,
      s"ledger at $path was built with '$existing', compact asked for '$line'")
    // rebucket rides the compaction rewrite: the staged trees use the
    // NEW fan-out and the `_compacting` marker carries the new `_params`
    // line, which the roll-forward commits after the tree swap — so
    // `_params` and the live trees can never disagree post-recovery
    // (readers refuse the in-between state, see [[rebucketPending]])
    val b2 = rebucketTo.getOrElse(b)
    val fold = ingestLabels(spark, path).toSet -- keepLabels
    // nothing to fold: no labels, or only the previous compaction output
    // (a pure rebucket still rewrites everything)
    if (b2 == b &&
      (fold.isEmpty || (fold.size == 1 && fold.contains(into)))) return
    val fsys = markerFs(path)
    fsys.delete(tmpRoot(path), true)
    val relabel = when(col("ingest").isin(fold.toSeq: _*), lit(into))
      .otherwise(col("ingest"))
    // distinct over the relabeled rows: folding cannot create duplicates
    // that were not already logically present (healed torn writes). The
    // bucket columns are pure functions of the keys, so recomputing them
    // at the target fan-out IS the rebucket migration.
    spark.read.parquet(s"$path/bands")
      .select(col("doc_id"), col("band"), col("band_key"), relabel.as("ingest"))
      .distinct()
      .withColumn("bkb", bandBucket(col("band"), col("band_key"), b2))
      .hint("rebalance", "ingest", "bkb")
      .write.partitionBy("ingest", "bkb")
      .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "bands").toString)
    spark.read.parquet(s"$path/fp")
      .select(col("doc_id"), col("fp"), relabel.as("ingest"))
      .distinct()
      .withColumn("fpb", fpBucket(col("fp"), b2))
      .hint("rebalance", "ingest", "fpb")
      .write.partitionBy("ingest", "fpb")
      .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "fp").toString)
    // the takedown sidecar relabels in lockstep (folding collapses a
    // doc's rows from several labels into identical (table, into,
    // bucket) rows — distinct() dedupes them); bucket values recompute
    // at the target fan-out alongside
    if (sidecarComplete(path)) {
      // bucket values must be recomputed from the KEYS at b2, which the
      // sidecar does not carry — rebuild them from the staged tables'
      // own rows instead (exact by construction, one narrow scan each)
      val fpSide = spark.read.parquet(
          new org.apache.hadoop.fs.Path(tmpRoot(path), "fp").toString)
        .select(col("doc_id"), lit("fp").as("table"), col("ingest"),
          fpBucket(col("fp"), b2).as("bucket")).distinct()
      val bandSide = spark.read.parquet(
          new org.apache.hadoop.fs.Path(tmpRoot(path), "bands").toString)
        .select(col("doc_id"), lit("bands").as("table"), col("ingest"),
          bandBucket(col("band"), col("band_key"), b2).as("bucket"))
        .distinct()
      fpSide.unionByName(bandSide)
        .withColumn("idb", idBucket(col("doc_id"), b2))
        .hint("rebalance", "idb")
        .write.partitionBy("idb")
        .parquet(new org.apache.hadoop.fs.Path(tmpRoot(path), "dirs").toString)
      val out = markerFs(path).create(new org.apache.hadoop.fs.Path(
        tmpRoot(path), "dirs/_complete"), true)
      try out.write("1\n".getBytes("UTF-8")) finally out.close()
    }
    // the marker is the commit point: from here a crash rolls FORWARD.
    // A rebucket records the new _params line IN the marker so recovery
    // finishes the layout change atomically with the tree swap.
    val markerBody =
      if (b2 != b) "params:" + paramsLine(n, numHashes, rowsPerBand, b2)
      else "1"
    swapOpCounter.set(0)
    swapStep()
    val out = fsys.create(compactingMarker(path), true)
    try out.write((markerBody + "\n").getBytes("UTF-8")) finally out.close()
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
    // a rebucketing compaction recorded the new _params line in the
    // marker — read it BEFORE any deletion so every resume sees it
    val newParams = compactingContent(path).filter(_.startsWith("params:"))
      .map(_.stripPrefix("params:"))
    fsys.mkdirs(oldRoot(path))
    for (t <- Seq("bands", "fp", "dirs")) {
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
    // _params flips while the marker still exists: a kill between the
    // two leaves the marker, and the rerun rewrites _params again —
    // idempotent, so trees and params agree once the marker is gone
    newParams.foreach { line => swapStep(); writeMarker(path, line) }
    swapStep(); fsys.delete(oldRoot(path), true)
    swapStep(); fsys.delete(tmpRoot(path), true)
    swapStep(); fsys.delete(compactingMarker(path), false)
  }
}

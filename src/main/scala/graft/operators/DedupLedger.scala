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
  * Layout: Hive-partitioned by `ingest` (the batch label), the same
  * directory-partitioning the warehouse star uses
  * ([[graft.core.TableWriter.writePartitioned]]) — each screened batch
  * APPENDS one new partition for its kept docs, so the next batch's
  * screen reads the whole ledger with partition pruning available for
  * replays/backouts of a bad ingest day. At 100 TB of history the
  * ledger is what turns the per-batch screen from a full history
  * shingle+MinHash rescan into parquet scans of two narrow tables whose
  * size is rows-per-doc-bounded, plus text reads for band-collision
  * survivors only.
  *
  * The LSH parameters (n, numHashes, rowsPerBand) are baked into the
  * band rows — a ledger is only valid for the parameters it was built
  * with, so they are recorded in a `_params` marker file at write time
  * and re-validated on read. */
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

  private def paramsFile(path: String) = new java.io.File(path, "_params")

  private def paramsLine(n: Int, numHashes: Int, rowsPerBand: Int) =
    s"n=$n numHashes=$numHashes rowsPerBand=$rowsPerBand"

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
    val pf = paramsFile(path)
    val line = paramsLine(n, numHashes, rowsPerBand)
    if (pf.isFile && !overwrite) {
      val existing = new String(
        java.nio.file.Files.readAllBytes(pf.toPath), "UTF-8").trim
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
    bands(docs, idCol, textCol, n, numHashes, rowsPerBand)
      .withColumn("ingest", lit(ingest))
      .write.mode(mode).partitionBy("ingest").parquet(s"$path/bands")
    fingerprints(docs, idCol, textCol)
      .withColumn("ingest", lit(ingest))
      .write.mode(mode).partitionBy("ingest").parquet(s"$path/fp")
    pf.getParentFile.mkdirs()
    java.nio.file.Files.write(pf.toPath, (line + "\n").getBytes("UTF-8"))
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

  /** Read the ledger back as the two frames
    * [[Dedup.incrementalDedupLedgered]] takes, validating that the LSH
    * parameters match what the ledger was built with. The `ingest`
    * partition column is dropped — verdicts do not depend on which batch
    * kept a history doc. */
  def read(spark: SparkSession, path: String,
           n: Int, numHashes: Int, rowsPerBand: Int): (DataFrame, DataFrame) = {
    val pf = paramsFile(path)
    require(pf.isFile, s"no ledger at $path (missing ${pf.getName})")
    val existing = new String(
      java.nio.file.Files.readAllBytes(pf.toPath), "UTF-8").trim
    val line = paramsLine(n, numHashes, rowsPerBand)
    require(existing == line,
      s"ledger at $path was built with '$existing', screen asked for '$line'")
    (spark.read.parquet(s"$path/fp").select(col("doc_id"), col("fp")),
      spark.read.parquet(s"$path/bands")
        .select(col("doc_id"), col("band"), col("band_key")))
  }

  /** Does a ledger exist at `path`? (The CLI bootstraps one when not.) */
  def exists(path: String): Boolean = paramsFile(path).isFile
}

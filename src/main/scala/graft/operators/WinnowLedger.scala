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

  private def paramsLine(k: Int, w: Int) = s"k=$k|w=$w"

  def exists(path: String): Boolean = fs(path).exists(markerPath(path))

  private def validate(path: String, k: Int, w: Int): Unit = {
    val in = fs(path).open(markerPath(path))
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    require(line == paramsLine(k, w),
      s"winnow ledger at $path was built with ($line), caller wants " +
        s"(${paramsLine(k, w)}) — rebuild or match parameters")
  }

  /** Append `docs`' winnowing fingerprints under `ingest`. The `_params`
    * marker is written BEFORE the first parquet append (the DedupLedger
    * torn-write order): a crash between marker and append leaves an
    * empty ledger the reconcile heals completely, while the reverse
    * order would leave marker-less data a later bootstrap re-appends —
    * duplicate rows. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            k: Int, w: Int, path: String, ingest: String): Unit = {
    if (exists(path)) validate(path, k, w)
    else {
      val out = fs(path).create(markerPath(path), true)
      out.write((paramsLine(k, w) + "\n").getBytes("UTF-8"))
      out.close()
    }
    TextAnalysis.winnowFingerprints(docs, idCol, textCol, k, w)
      .withColumnRenamed(idCol, "doc_id")
      .withColumn("ingest", lit(ingest))
      .write.mode("append").partitionBy("ingest").parquet(s"$path/wfp")
  }

  /** The (doc_id, pos, fp) frame, parameters re-validated. A marker with
    * no data yet (the marker-first crash window) reads as empty. */
  def read(spark: SparkSession, path: String, k: Int, w: Int): DataFrame = {
    require(exists(path), s"no winnow ledger at $path (missing _params)")
    validate(path, k, w)
    import spark.implicits._
    if (!fs(path).exists(new org.apache.hadoop.fs.Path(path, "wfp")))
      Seq.empty[(Long, Long, String)].toDF("doc_id", "pos", "fp")
    else
      spark.read.parquet(s"$path/wfp")
        .select(col("doc_id"), col("pos"), col("fp"))
  }

  /** Re-append fingerprints for corpus docs a torn cycle left out —
    * the [[DedupLedger.reconcile]] anti-join; bootstrap (no ledger yet)
    * is the degenerate heal-everything case. */
  def reconcile(corpus: DataFrame, idCol: String, textCol: String,
                k: Int, w: Int, path: String, ingest: String): Unit = {
    val missing =
      if (!exists(path)) corpus
      else corpus.join(
        read(corpus.sparkSession, path, k, w)
          .select(col("doc_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    if (!missing.isEmpty) write(missing, idCol, textCol, k, w, path, ingest)
  }
}

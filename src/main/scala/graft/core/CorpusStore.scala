package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Id-hash-bucketed corpus directory layout — the
  * [[graft.operators.DedupLedger]] bucket discipline applied to the
  * corpus itself, so a takedown rewrites only the bucket partitions the
  * retracted ids live in instead of the whole corpus. Without it,
  * removing ONE document from a 100 TB corpus costs a full rewrite plus
  * several full-scan checksums; with it the cost is
  * O(|affected buckets|) ≈ O(|retracted ids|) regardless of corpus
  * size, and the affected buckets are computed from the ids alone — no
  * corpus scan even for discovery.
  *
  * A corpus starts however the user made it (plain appendable parquet).
  * `--bucket-corpus` migrates it once — a staged, checksum-validated
  * whole rewrite into `docb=pmod(xxhash64(id), buckets)` partitions,
  * recording the layout in a `_corpus_layout` marker. From then on:
  *
  *  - cycle appends preserve the layout ([[append]] consults the
  *    marker; the rebalance hint avoids the task×bucket file spray);
  *  - `--retract` goes through [[PartitionSwap]]: per-bucket staging,
  *    per-bucket row-count + order-free checksum validation against the
  *    expected survivors, swap-vs-drop marker commit, roll-forward
  *    recovery — untouched buckets are never read or rewritten;
  *  - `--compact-corpus` preserves the layout (per-bucket rewrite).
  *
  * Readers go through [[read]], which drops the layout column and
  * refuses a half-committed retraction loudly — the logical corpus is
  * unchanged by the layout. */
object CorpusStore {

  val DefaultBuckets = 64

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_corpus_layout")

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def paramsLine(buckets: Int, idCol: String) =
    s"buckets=$buckets idcol=$idCol"

  /** Write the layout marker into `dir` (a staged tree, so the layout
    * commits WITH the data it describes — used by [[bucketize]] and the
    * CLI's layout-preserving corpus compaction). */
  private[graft] def writeLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
                                       dir: org.apache.hadoop.fs.Path,
                                       buckets: Int, idCol: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_corpus_layout"),
      true)
    try out.write((paramsLine(buckets, idCol) + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Has this corpus been migrated to the bucketed layout? */
  def isBucketed(path: String): Boolean = fsOf(path).isFile(markerPath(path))

  /** The recorded (buckets, idCol), validated against the caller's id
    * column — an append or retract keyed on a different column would
    * compute different buckets and silently miss. */
  private[graft] def layout(path: String, idCol: String): Int = {
    val in = fsOf(path).open(markerPath(path))
    val line = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
    finally in.close()
    val m = "buckets=(\\d+) idcol=(.+)".r
    line match {
      case m(b, id) =>
        require(id == idCol,
          s"corpus at $path is bucketed by id column '$id', caller used " +
            s"'$idCol' — the bucket function would not match")
        b.toInt
      case _ => throw new IllegalArgumentException(
        s"unreadable _corpus_layout at $path: '$line'")
    }
  }

  private[graft] def bucketCol(idCol: String, buckets: Int): Column =
    pmod(xxhash64(col(idCol)), lit(buckets.toLong)).cast("int")

  /** The logical corpus: the layout column (when present) is dropped and
    * a pending half-committed [[retract]] is refused loudly (some
    * buckets swapped, some not — reading it would be silently wrong;
    * recovery is a writer's job under the cycle lock, see [[recover]]). */
  def read(spark: SparkSession, path: String): DataFrame = {
    require(!PartitionSwap.pending(fsOf(path),
        new org.apache.hadoop.fs.Path(path)),
      s"corpus at $path has an unfinished retraction — run " +
        "CorpusStore.recover (the curate cycle does this under its lock)")
    spark.read.parquet(path).drop("docb")
  }

  /** Finish an interrupted [[retract]] (idempotent, cheap when clean).
    * Writers — the curate cycle, retract itself — run this first. */
  def recover(spark: SparkSession, path: String): Boolean =
    PartitionSwap.recover(fsOf(path), new org.apache.hadoop.fs.Path(path))

  /** Append kept docs, following the corpus' recorded layout: bucketed
    * corpora get the docb partition column (REBALANCEd so a write task
    * never holds a file open per bucket it happens to see), unmigrated
    * corpora keep their plain flat append. */
  def append(docs: DataFrame, path: String, idCol: String): Unit =
    if (!isBucketed(path)) docs.write.mode("append").parquet(path)
    else {
      val b = layout(path, idCol)
      docs.withColumn("docb", bucketCol(idCol, b))
        .hint("rebalance", "docb")
        .write.mode("append").partitionBy("docb").parquet(path)
    }

  /** One-time layout migration (`--bucket-corpus`): rewrite the corpus
    * into `buckets` id-hash partitions. Content-preserving by
    * VALIDATION like the corpus compaction — the staged tree must
    * reproduce the logical row count and order-free checksum before the
    * [[Publish.swapArtifact]] park-and-swap (a kill never loses the
    * previous corpus; the next cycle heals a parked copy back). Also
    * the re-bucket path: running it again with a different count
    * migrates bucketed → bucketed. Returns (rows, buckets). */
  def bucketize(spark: SparkSession, path: String, idCol: String,
                buckets: Int = DefaultBuckets): (Long, Int) = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(path)
    Publish.healArtifact(fs, target)
    recover(spark, path)
    require(fs.exists(target), s"no corpus at $path")
    val before = read(spark, path)
    require(before.columns.contains(idCol),
      s"corpus at $path has no '$idCol' column")
    val (cnt, sig) = checksum(before)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    fs.delete(tmp, true)
    before.withColumn("docb", bucketCol(idCol, buckets))
      .hint("rebalance", "docb")
      .write.partitionBy("docb").parquet(tmp.toString)
    writeLayoutMarker(fs, tmp, buckets, idCol)
    val (cnt2, sig2) = checksum(spark.read.parquet(tmp.toString).drop("docb"))
    require(cnt2 == cnt && sig2 == sig,
      s"staged corpus diverged (rows $cnt -> $cnt2, checksum $sig -> $sig2)" +
        " — refusing to swap; the live corpus is untouched")
    Publish.swapArtifact(fs, tmp, target)
    (cnt, buckets)
  }

  /** Logical row count + order-free content checksum (shared with the
    * CLI compaction validation). */
  private[graft] def checksum(df: DataFrame): (Long, Long) = {
    val row = df.select(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(*))"), lit(0L)).as("x"))
      .collect().head
    (row.getLong(0), row.getLong(1))
  }

  /** Surgical takedown on a bucketed corpus: only the bucket partitions
    * the retracted ids hash into are read, validated and rewritten.
    * Discovery is O(|ids|) — the affected bucket set comes from the ids
    * frame alone, never from a corpus scan. Validation is PER BUCKET:
    * each staged bucket must reproduce the expected survivor row count
    * and order-free checksum computed from the same immutable input
    * files, or the commit is refused with the live corpus untouched.
    * The commit is the [[PartitionSwap]] swap-vs-drop marker (a bucket
    * whose every row is retracted stages no dir and DROPs); a kill at
    * any point either leaves the old corpus live or rolls FORWARD via
    * [[recover]]. Returns (rowsRemoved, affectedBuckets). */
  def retract(spark: SparkSession, path: String, idCol: String,
              ids: DataFrame): (Long, Int) = {
    val fs = fsOf(path)
    val root = new org.apache.hadoop.fs.Path(path)
    Publish.healArtifact(fs, root)
    recover(spark, path)
    val b = layout(path, idCol)
    val idSet = ids.select(col(ids.columns.head).as(idCol)).distinct()
      .localCheckpoint() // consumed by the bucket set + join per bucket
    val wanted = idSet.select(bucketCol(idCol, b).as("docb"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq // bounded <= b
    val rels = wanted.map(w => s"docb=$w")
      .filter(r => fs.exists(new org.apache.hadoop.fs.Path(root, r)))
    if (rels.isEmpty) return (0L, 0)
    val affected = spark.read.option("basePath", path)
      .parquet(rels.map(r => s"$path/$r"): _*)
      .drop("docb") // recomputed below: partition values can read as string
    val removed = affected.join(idSet, Seq(idCol), "left_semi").count()
    if (removed == 0L) return (0L, 0)
    val keep = affected.join(idSet, Seq(idCol), "left_anti")
      .withColumn("docb", bucketCol(idCol, b))
    def perBucket(df: DataFrame): Map[Int, (Long, Long)] =
      df.groupBy(col("docb")).agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(*))"), lit(0L)).as("x"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
        .toMap // bounded <= |affected buckets|
    val want = perBucket(keep)
    fs.delete(PartitionSwap.tmpRoot(root), true)
    keep.write.partitionBy("docb")
      .parquet(PartitionSwap.tmpRoot(root).toString)
    // NOTE bit_xor(xxhash64(*)) over (docb, <logical cols>) on both
    // sides: docb is recomputed from the id on the staged side too, so
    // the checksum is layout-independent and exact per bucket. An
    // all-retracted affected set stages no parquet (every rel DROPs) —
    // nothing to validate.
    if (want.nonEmpty) {
      val staged = spark.read.option("basePath",
          PartitionSwap.tmpRoot(root).toString)
        .parquet(PartitionSwap.tmpRoot(root).toString)
        .drop("docb").withColumn("docb", bucketCol(idCol, b))
      require(perBucket(staged) == want,
        "staged corpus buckets diverged from expected survivors — " +
          "refusing to swap; the live corpus is untouched")
    }
    PartitionSwap.commit(fs, root, rels)
    (removed, rels.size)
  }
}

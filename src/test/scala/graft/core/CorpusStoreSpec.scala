package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed corpus layout: migration is content-preserving, cycle
  * appends follow the layout, takedowns rewrite ONLY affected buckets
  * (untouched dirs byte-untouched), and every kill point of the swap
  * recovers to the clean result. */
class CorpusStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Seq[Long]) =
    ids.map(i => (i, s"document number $i with its own words $i"))
      .toDF("doc_id", "text")

  private def logical(path: String): Seq[(Long, String)] =
    CorpusStore.read(spark, path).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("bucketize preserves content, records the layout, appends follow it") {
    val root = java.nio.file.Files.createTempDirectory("cstore").toString
    val corpus = s"$root/corpus"
    docs(1L to 40L).write.parquet(corpus)
    val flat = logical(corpus)
    assert(!CorpusStore.isBucketed(corpus))

    val (rows, b) = CorpusStore.bucketize(spark, corpus, "doc_id", 8)
    assert(rows == 40L && b == 8)
    assert(CorpusStore.isBucketed(corpus))
    assert(logical(corpus) == flat, "migration changed the logical corpus")
    val dirs = new java.io.File(corpus).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("docb=")).toSeq
    assert(dirs.nonEmpty && dirs.forall { d =>
      val v = d.stripPrefix("docb=").toInt; v >= 0 && v < 8
    }, s"bad bucket dirs: $dirs")

    // appends land inside the bucket layout, not as flat root files
    CorpusStore.append(docs(41L to 44L), corpus, "doc_id")
    assert(logical(corpus) == (flat ++ docs(41L to 44L).collect()
      .map(r => (r.getLong(0), r.getString(1)))).sorted)
    val rootFiles = new java.io.File(corpus).listFiles().filter(_.isFile)
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(rootFiles.isEmpty, s"append wrote flat files: ${rootFiles.toSeq}")

    // re-bucket migrates bucketed -> bucketed
    val (rows2, b2) = CorpusStore.bucketize(spark, corpus, "doc_id", 4)
    assert(rows2 == 44L && b2 == 4)
    assert(logical(corpus).size == 44)

    // a different id column is refused (bucket function would not match)
    intercept[IllegalArgumentException] {
      CorpusStore.append(docs(50L to 51L), corpus, "other_id")
    }
  }

  test("surgical retract: only affected buckets rewritten, idempotent, no ghosts") {
    val root = java.nio.file.Files.createTempDirectory("cstore_r").toString
    val corpus = s"$root/corpus"
    docs(1L to 60L).write.parquet(corpus)
    CorpusStore.bucketize(spark, corpus, "doc_id", 16)

    // part-file names are write-unique (UUID-bearing): an untouched dir
    // keeps its exact file list, a rewritten one cannot
    def dirState(): Map[String, Set[String]] =
      new java.io.File(corpus).listFiles().filter(f =>
          f.isDirectory && f.getName.startsWith("docb=")).map { d =>
        d.getName -> d.listFiles().map(_.getName).toSet
      }.toMap
    val before = dirState()

    val ids = Seq(5L, 17L, 33L).toDF("doc_id")
    val (removed, buckets) = CorpusStore.retract(spark, corpus, "doc_id", ids)
    assert(removed == 3L && buckets > 0 && buckets <= 3)

    // untouched bucket dirs were never rewritten
    val after = dirState()
    val affectedDirs = before.keySet.filter(d => after.get(d) != before.get(d))
    assert(affectedDirs.size == buckets,
      s"expected $buckets rewritten dirs, saw $affectedDirs")

    val left = logical(corpus)
    assert(!left.exists(r => Set(5L, 17L, 33L)(r._1)), "ghost rows survive")
    assert(left.size == 57)

    // idempotent: retracting the same ids again is a no-op
    assert(CorpusStore.retract(spark, corpus, "doc_id", ids) == ((0L, 0)))
    // ids absent from the corpus: no-op
    assert(CorpusStore.retract(spark, corpus, "doc_id",
      Seq(999L).toDF("doc_id")) == ((0L, 0)))
    assert(logical(corpus) == left)
  }

  test("retract kill-point sweep: reads refuse a pending swap, recovery rolls forward") {
    val ids = Seq(3L, 21L, 48L)
    def build(): String = {
      val root = java.nio.file.Files.createTempDirectory("cstore_k").toString
      val corpus = s"$root/corpus"
      docs(1L to 60L).write.parquet(corpus)
      CorpusStore.bucketize(spark, corpus, "doc_id", 16)
      corpus
    }
    val clean = build()
    CorpusStore.retract(spark, clean, "doc_id", ids.toDF("doc_id"))
    val want = logical(clean)

    var ops = 1
    var sawCompletion = false
    var sawPending = false
    while (!sawCompletion && ops < 80) {
      val corpus = build()
      PartitionSwap.testFailAfterOps = Some(ops)
      val killed =
        try { CorpusStore.retract(spark, corpus, "doc_id",
            ids.toDF("doc_id")); false }
        catch { case _: IllegalStateException => true }
        finally PartitionSwap.testFailAfterOps = None
      if (killed) {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        if (PartitionSwap.pending(fs,
            new org.apache.hadoop.fs.Path(corpus))) {
          sawPending = true
          // a reader must refuse the half-swapped corpus...
          intercept[IllegalArgumentException] {
            CorpusStore.read(spark, corpus)
          }
          // ...and recovery rolls FORWARD to the retracted state
          assert(CorpusStore.recover(spark, corpus))
        } else {
          // killed before the commit point: live corpus intact, the
          // retract did not happen — re-running completes it
          assert(!CorpusStore.recover(spark, corpus))
          CorpusStore.retract(spark, corpus, "doc_id", ids.toDF("doc_id"))
        }
        assert(logical(corpus) == want, s"kill at op $ops diverged")
      } else sawCompletion = true
      ops += 1
    }
    assert(sawCompletion && sawPending,
      "sweep never exercised both a pending marker and a clean run")
  }
}

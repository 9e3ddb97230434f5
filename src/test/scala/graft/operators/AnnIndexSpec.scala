package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vectors(n: Int, dim: Int = 8) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")

  test("persisted search == in-memory IVF tier, bit for bit") {
    val root = java.nio.file.Files.createTempDirectory("annidx").toString
    val vs = vectors(120)
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 8, s"$root/idx")
    val qs = vs.filter($"vec_id" < 5)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val persisted = AnnIndex.search(spark, s"$root/idx", qs,
      "vec_id", "embedding", k = 6, nprobe = 3).collect().map(key).sorted
    val inMemory = Similarity.ivfTopKWith(vs, qs, "vec_id", "embedding",
        k = 6, nprobe = 3,
        centroids = Similarity.seedCentroids(vs, "vec_id", "embedding", 8))
      .collect().map(key).sorted
    assert(persisted.toSeq == inMemory.toSeq)
  }

  test("search loads ONLY the probed lists' directories") {
    val root = java.nio.file.Files.createTempDirectory("annidx2").toString
    val vs = vectors(200)
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 10, s"$root/idx")
    val res = AnnIndex.search(spark, s"$root/idx", vs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 5, nprobe = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one query x nprobe=2: the postings file index holds <= 2 paths of
    // the 10 partitions (the unprobed 8 are never even listed)
    val loc = "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    assert(loc.nonEmpty, s"no file index in plan:\n${plan.take(1200)}")
    assert(loc.exists(_ <= 2),
      s"expected a <=2-path postings scan (nprobe=2), got $loc:\n${plan.take(1200)}")
    // and the rank is the k-capped aggregate, not a window
    assert(!plan.contains("Window ["), "index search leaked a window")
  }

  test("params validate; torn publish never visible; empty probes handled") {
    val root = java.nio.file.Files.createTempDirectory("annidx3").toString
    val vs = vectors(50)
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
    assert(!new java.io.File(s"$root/idx.tmp").exists()) // staged publish
    // foreign centroid table (wrong count) -> fail fast
    vectors(6).select($"vec_id".as("centroid_id"), $"embedding".as("c_vec"))
      .write.mode("overwrite").parquet(s"$root/idx/centroids")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.search(spark, s"$root/idx", vs.limit(1),
        "vec_id", "embedding", k = 3, nprobe = 2)
    }
    assert(e.getMessage.contains("rebuild the index"))
  }

  test("append under the frozen quantizer == one-shot build over the union") {
    val root = java.nio.file.Files.createTempDirectory("annidx5").toString
    val all = vectors(150)
    val day1 = all.filter($"vec_id" < 100)
    val day2 = all.filter($"vec_id" >= 100)
    // incremental: build on day1's vectors, append day2's
    AnnIndex.build(day1, "vec_id", "embedding", numLists = 6, s"$root/inc")
    AnnIndex.append(day2, "vec_id", "embedding", s"$root/inc")
    // one-shot, with the SAME quantizer (day1's seed centroids — an
    // append never retrains, so the comparison freezes the centroids)
    AnnIndex.build(all, "vec_id", "embedding", numLists = 6, s"$root/full",
      centroids = Some(
        Similarity.seedCentroids(day1, "vec_id", "embedding", 6)))
    val qs = all.filter($"vec_id" < 4)
    def run(p: String) = AnnIndex.search(spark, p, qs,
        "vec_id", "embedding", k = 8, nprobe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toSeq
    assert(run(s"$root/inc") == run(s"$root/full"))
    // appended vectors are actually findable
    assert(run(s"$root/inc").exists(_._2 >= 100L))
  }

  test("empty postings partitions: probing a never-written list is safe") {
    val root = java.nio.file.Files.createTempDirectory("annidx4").toString
    // 3 identical clusters of vectors -> most of the 6 seed lists empty
    val vs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (if (i % 3 == 0) 1.0f else if (i % 3 == 1) -1.0f else 0.5f) * (j + 1)))
    }.toDF("vec_id", "embedding")
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 6, s"$root/idx")
    val res = AnnIndex.search(spark, s"$root/idx", vs.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 4, nprobe = 6).collect()
    assert(res.nonEmpty) // probing empty lists neither errors nor blocks
  }

  test("publish is park-and-swap: a crash between renames never loses the artifact") {
    val root = java.nio.file.Files.createTempDirectory("annidx_swap").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)

    // v1 index published, then v2 over it — the parked copy is cleaned up
    val vs = vectors(60)
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
    assert(!fs.exists(p(s"$root/idx.old")), "stale parked copy survived")

    // simulate the mid-swap crash: target parked aside, tmp never renamed
    // in (the exact window the old delete-then-rename turned into loss)
    assert(fs.rename(p(s"$root/idx"), p(s"$root/idx.old")))
    // a reader heals the parked copy back and searches normally
    val healed = AnnIndex.search(spark, s"$root/idx", vs.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 4, nprobe = 2).collect()
    assert(healed.nonEmpty)
    assert(fs.exists(p(s"$root/idx")) && !fs.exists(p(s"$root/idx.old")))

    // same discipline on the BPE merge artifact
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val merges = Bpe.train(wf, numMerges = 2)
    Bpe.save(spark, merges, s"$root/merges")
    assert(fs.rename(p(s"$root/merges"), p(s"$root/merges.old")))
    assert(Bpe.load(spark, s"$root/merges") == merges) // healed
    assert(!fs.exists(p(s"$root/merges.old")))

    // and on the classifier weight artifact
    TextAnalysis.saveWeights(spark, Array(0.25, -0.5), 0.125, s"$root/w")
    assert(fs.rename(p(s"$root/w"), p(s"$root/w.old")))
    val (w, b) = TextAnalysis.loadWeights(spark, s"$root/w")
    assert(w.toSeq == Seq(0.25, -0.5) && b == 0.125)
    assert(!fs.exists(p(s"$root/w.old")))
  }

  test("delete-by-id: search == rebuild without the rows; only affected lists rewritten") {
    val root = java.nio.file.Files.createTempDirectory("annidx_del").toString
    val vs = vectors(60)
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
    val origCentroids = spark.read.parquet(s"$root/idx/centroids")

    // capture partition mtimes to prove untouched lists are not rewritten
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def listDirs(): Map[String, Long] = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/idx/postings")).toSeq
      .filter(_.isDirectory).map(s =>
        s.getPath.getName -> s.getModificationTime).toMap
    val before = listDirs()

    import spark.implicits._
    val dropIds = Seq(3L, 7L, 11L).toDF("vec_id")
    val affected = AnnIndex.delete(spark, s"$root/idx", dropIds, "vec_id")
    assert(affected.nonEmpty)

    // untouched list partitions were not rewritten
    val after = listDirs()
    val untouched = before.keySet -- affected.map(l => s"list_id=$l")
    untouched.foreach { d =>
      assert(after(d) == before(d), s"untouched partition $d was rewritten")
    }

    // search equals a rebuild (SAME quantizer, minus the rows)
    val remaining = vs.filter(!$"vec_id".isin(3L, 7L, 11L))
    AnnIndex.build(remaining, "vec_id", "embedding", numLists = 4,
      s"$root/rebuilt", centroids = Some(origCentroids))
    val queries = vs.filter($"vec_id" < 5)
    def results(p: String) = AnnIndex.search(spark, p, queries,
        "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(results(s"$root/idx") == results(s"$root/rebuilt"),
      "deleted index diverged from rebuild-without-rows")
    // the deleted ids are gone as neighbors
    assert(!results(s"$root/idx").exists(r =>
      Set(3L, 7L, 11L)(r.getLong(r.fieldIndex("neighbor_id")))))

    // deleting ids not in the index is a no-op
    assert(AnnIndex.delete(spark, s"$root/idx",
      Seq(999L).toDF("vec_id"), "vec_id").isEmpty)
  }

  test("delete kill-point sweep: every interrupted swap recovers to identical results") {
    import spark.implicits._
    val vs = vectors(60)
    val queries = vs.filter($"vec_id" < 5)
    val dropIds = Seq(2L, 9L, 14L)

    // expected end state from an uninterrupted delete
    val cleanRoot = java.nio.file.Files.createTempDirectory("annidx_ks0").toString
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$cleanRoot/idx")
    AnnIndex.delete(spark, s"$cleanRoot/idx", dropIds.toDF("vec_id"), "vec_id")
    val want = AnnIndex.search(spark, s"$cleanRoot/idx", queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy("q_id", "rank").collect().toSeq

    var ops = 1
    var sawCompletion = false
    while (!sawCompletion && ops < 60) {
      val root = java.nio.file.Files.createTempDirectory(s"annidx_ks$ops").toString
      AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
      graft.core.PartitionSwap.testFailAfterOps = Some(ops)
      val killed =
        try { AnnIndex.delete(spark, s"$root/idx", dropIds.toDF("vec_id"),
            "vec_id"); false }
        catch { case _: IllegalStateException => true }
        finally graft.core.PartitionSwap.testFailAfterOps = None
      if (killed) {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        if (graft.core.PartitionSwap.pending(fs,
            new org.apache.hadoop.fs.Path(s"$root/idx"))) {
          // a reader must refuse the half-swapped index...
          intercept[IllegalArgumentException] {
            AnnIndex.search(spark, s"$root/idx", queries,
              "vec_id", "embedding", k = 5, nprobe = 4)
          }
          // ...and recovery rolls FORWARD to the deleted state
          assert(AnnIndex.recoverDelete(spark, s"$root/idx"))
          val got = AnnIndex.search(spark, s"$root/idx", queries,
            "vec_id", "embedding", k = 5, nprobe = 4)
            .orderBy("q_id", "rank").collect().toSeq
          assert(got == want, s"kill at op $ops: recovery diverged")
        } else {
          // killed before the marker (commit point): live index intact,
          // the delete simply did not happen — re-running it completes
          assert(!AnnIndex.recoverDelete(spark, s"$root/idx"))
          AnnIndex.delete(spark, s"$root/idx", dropIds.toDF("vec_id"),
            "vec_id")
          val got = AnnIndex.search(spark, s"$root/idx", queries,
            "vec_id", "embedding", k = 5, nprobe = 4)
            .orderBy("q_id", "rank").collect().toSeq
          assert(got == want, s"kill at op $ops: rerun diverged")
        }
      } else sawCompletion = true
      ops += 1
    }
    assert(sawCompletion, "sweep never reached an uninterrupted delete")
  }

  test("loaders never mutate a live artifact: a stale parked copy survives reads") {
    val root = java.nio.file.Files.createTempDirectory("annidx_stale").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val merges = Bpe.train(wf, numMerges = 2)
    Bpe.save(spark, merges, s"$root/merges")
    // a stale `.old` next to a LIVE target is the writer's to clean — a
    // loader deleting it could strand an in-flight swap (the parked copy
    // is the crash-recovery state). Fake one and read through it.
    fs.mkdirs(p(s"$root/merges.old"))
    assert(Bpe.load(spark, s"$root/merges") == merges)
    assert(fs.exists(p(s"$root/merges.old")),
      "loader deleted the parked copy next to a live artifact")
    // the next WRITER cleans it up as part of its own swap
    Bpe.save(spark, merges, s"$root/merges")
    assert(!fs.exists(p(s"$root/merges.old")))
  }

  test("swapArtifact refuses to nest when a concurrent heal restores the target mid-swap") {
    val root = java.nio.file.Files.createTempDirectory("annidx_race").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val merges = Bpe.train(wf, numMerges = 2)
    Bpe.save(spark, merges, s"$root/merges")
    // simulate a concurrent healer restoring the freshly parked copy in
    // the window between the park and the publish rename: without the
    // guard the publish would NEST the staged tree inside the restored
    // dir (HDFS rename-into-existing-dir) — silent corruption
    graft.core.Publish.testAfterPark = Some(() =>
      graft.core.Publish.healArtifact(fs, p(s"$root/merges")))
    try {
      intercept[IllegalStateException] {
        Bpe.save(spark, Bpe.train(wf, numMerges = 1), s"$root/merges")
      }
    } finally graft.core.Publish.testAfterPark = None
    // nothing lost, nothing nested: the healed v1 artifact is live and valid
    assert(Bpe.load(spark, s"$root/merges") == merges)
    assert(!fs.exists(p(s"$root/merges/merges.tmp")),
      "staged tree nested inside the live artifact")
  }

  test("delete discovery reads the id sidecar, not the postings; fallback still works") {
    val root = java.nio.file.Files.createTempDirectory("annidx_sc").toString
    val vs = vectors(60)
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
    assert(new java.io.File(s"$root/idx/ids").isDirectory,
      "build did not write the id sidecar")

    // find the targets' lists from the sidecar, then corrupt a file in a
    // list that does NOT hold them: discovery + staging never open it
    val dropIds = Seq(3L, 7L)
    val lists = spark.read.parquet(s"$root/idx/ids")
      .filter($"vec_id".isin(dropIds: _*))
      .select($"list_id".cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    val untouched = (0L until 4L).find(l => !lists.contains(l) &&
      new java.io.File(s"$root/idx/postings/list_id=$l").isDirectory)
    assert(untouched.nonEmpty, "every list affected — reseed the fixture")
    val victim = new java.io.File(
      s"$root/idx/postings/list_id=${untouched.get}").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.write(victim.toPath, "junk".getBytes("UTF-8"))

    val affected = AnnIndex.delete(spark, s"$root/idx",
      dropIds.toDF("vec_id"), "vec_id")
    assert(affected.toSet == lists,
      s"sidecar discovery returned $affected, expected $lists")
    // sidecar rows for the deleted ids are scrubbed in the same commit
    assert(spark.read.parquet(s"$root/idx/ids")
      .filter($"vec_id".isin(dropIds: _*)).isEmpty)
    // appended vectors register in the sidecar and delete through it
    val extra = Seq((200L, Array.tabulate(8)(j =>
      math.sin(200 * 31 + j * 7).toFloat))).toDF("vec_id", "embedding")
    AnnIndex.append(extra, "vec_id", "embedding", s"$root/idx")
    assert(!spark.read.parquet(s"$root/idx/ids")
      .filter($"vec_id" === 200L).isEmpty, "append skipped the sidecar")
    assert(AnnIndex.delete(spark, s"$root/idx",
      Seq(200L).toDF("vec_id"), "vec_id").nonEmpty)

    // a pre-sidecar index (no ids/) falls back to the postings scan —
    // delete and subsequent appends still work, just unsurgically
    val legacy = s"$root/legacy"
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, legacy)
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr); f.delete()
    }
    rmr(new java.io.File(s"$legacy/ids"))
    assert(AnnIndex.delete(spark, legacy,
      Seq(3L).toDF("vec_id"), "vec_id").nonEmpty)
    AnnIndex.append(extra, "vec_id", "embedding", legacy) // skips sidecar
    assert(!new java.io.File(s"$legacy/ids").exists())
  }

  test("append after a crashed delete rolls the swap forward (vectors not lost)") {
    import graft.core.PartitionSwap
    val vs = vectors(60)
    val extra = (100 until 106).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val dropIds = Seq(2L, 9L, 14L).toDF("vec_id")
    val queries = vs.filter($"vec_id" < 5)
    def results(p: String) = AnnIndex.search(spark, p, queries,
        "vec_id", "embedding", k = 8, nprobe = 4)
      .orderBy("q_id", "rank").collect().toSeq

    // expected end state: clean delete, then append
    val cleanRoot = java.nio.file.Files.createTempDirectory("annidx_ad0").toString
    AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$cleanRoot/idx")
    AnnIndex.delete(spark, s"$cleanRoot/idx", dropIds, "vec_id")
    AnnIndex.append(extra, "vec_id", "embedding", s"$cleanRoot/idx")
    val want = results(s"$cleanRoot/idx")
    assert(want.exists(r => r.getLong(r.fieldIndex("neighbor_id")) >= 100L),
      "expected appended vectors among neighbors — widen k")

    // find a kill point that leaves the swap marker pending, then append
    var ops = 1
    var sawPending = false
    while (!sawPending && ops < 60) {
      val root = java.nio.file.Files.createTempDirectory(s"annidx_ad$ops").toString
      AnnIndex.build(vs, "vec_id", "embedding", numLists = 4, s"$root/idx")
      PartitionSwap.testFailAfterOps = Some(ops)
      val killed =
        try { AnnIndex.delete(spark, s"$root/idx", dropIds, "vec_id"); false }
        catch { case _: IllegalStateException => true }
        finally PartitionSwap.testFailAfterOps = None
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      if (killed && PartitionSwap.pending(fs,
          new org.apache.hadoop.fs.Path(s"$root/idx"))) {
        sawPending = true
        // append must recover the pending swap BEFORE writing, or its
        // files land in partitions the roll-forward then discards
        AnnIndex.append(extra, "vec_id", "embedding", s"$root/idx")
        assert(!PartitionSwap.pending(fs,
          new org.apache.hadoop.fs.Path(s"$root/idx")))
        assert(results(s"$root/idx") == want,
          s"kill at op $ops: append after crashed delete diverged")
      }
      ops += 1
    }
    assert(sawPending, "sweep never produced a pending swap marker")
  }
}

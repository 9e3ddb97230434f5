package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Crash-safe multi-table publish: a kill between two table swaps of one
  * batch must leave a manifest that the NEXT run rolls forward to a
  * consistent star (the reference gets batch atomicity from a DB
  * transaction, AbstractDataProcessor.groovy:58-75). */
class GraftCliManifestSpec extends SparkSpec {

  private def writeClinicalStudy(root: java.nio.file.Path, study: String,
                                 trial: String): Unit = {
    val dir = root.resolve(study).resolve("ClinicalDataToUpload")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("DEMO.txt"),
      s"""STUDY_ID\tSUBJ_ID\tAge\tSex
         |$trial\tP01\t61\tMale
         |$trial\tP02\t54\tFemale
         |""".stripMargin)
    Files.writeString(dir.resolve("MAP_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "DEMO.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "DEMO.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t3\tAge\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t4\tSex\t\t\t\n")
  }

  test("a kill between two table swaps is rolled forward to a consistent star on next start") {
    val wh = Files.createTempDirectory("graft-manifest-wh")
    val rootA = Files.createTempDirectory("graft-manifest-a")
    val rootB = Files.createTempDirectory("graft-manifest-b")
    writeClinicalStudy(rootA, "Study A", "MTRIALA")
    writeClinicalStudy(rootB, "Study B", "MTRIALB")
    assert(GraftCli.run(spark, Seq("-o", wh.toString, rootA.toString)) == 0)
    assert(GraftCli.run(spark, Seq("-o", wh.toString, rootB.toString)) == 0)
    val factDirB = wh.resolve("observation_fact.parquet")
      .resolve("sourcesystem_cd=MTRIALB")
    assert(Files.isDirectory(factDirB), "precondition: study B's facts on disk")

    // delete study B, but die after the FIRST of the batch's table swaps —
    // the same on-disk state a mid-publish kill leaves
    core.Publish.testFailAfterCommits = Some(1)
    try intercept[IllegalStateException] {
      GraftCli.run(spark, Seq("-o", wh.toString,
        "--delete-study-by-id", "MTRIALB", "--force-start"))
    } finally core.Publish.testFailAfterCommits = None

    // the star is mixed: ontology partially rewritten, B's fact partition
    // still present — and the manifest records the unfinished batch
    assert(Files.exists(wh.resolve("_publish.manifest")))
    assert(Files.isDirectory(factDirB),
      "the kill landed before observation_fact's swap")

    // next start: recovery completes the batch before any command runs
    assert(core.Publish.recoverPublish(spark, wh))
    assert(!Files.exists(wh.resolve("_publish.manifest")))
    assert(!Files.isDirectory(factDirB), "B's fact partition dropped by recovery")

    // consistent post-delete star: no trace of B, study A fully intact
    assert(GraftCli.readTable(spark, wh, "i2b2")
      .filter(col("sourcesystem_cd") === "MTRIALB").count() == 0)
    assert(GraftCli.readTable(spark, wh, "patient_dimension")
      .filter(col("sourcesystem_cd").startsWith("MTRIALB:")).count() == 0)
    assert(GraftCli.readTable(spark, wh, "observation_fact")
      .filter(col("sourcesystem_cd") === "MTRIALA").count() > 0)
    assert(GraftCli.readTable(spark, wh, "patient_dimension")
      .filter(col("sourcesystem_cd").startsWith("MTRIALA:")).count() == 2)
    // no leftover tmp/old staging artifacts anywhere
    val leftovers = java.nio.file.Files.walk(wh).iterator()
    val bad = new scala.collection.mutable.ArrayBuffer[String]
    leftovers.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".tmp") || n.endsWith(".old") || n.startsWith("_old_"))
        bad += wh.relativize(p).toString
    }
    assert(bad.isEmpty, s"staging leftovers survived recovery: $bad")

    // recovery is idempotent: nothing to do on a clean warehouse
    assert(!core.Publish.recoverPublish(spark, wh))

    // and a normal CLI start performs the same recovery implicitly: kill a
    // study-A delete mid-batch, then re-run the SAME delete — the startup
    // recovery first completes the old batch, the command then finishes
    core.Publish.testFailAfterCommits = Some(1)
    try intercept[IllegalStateException] {
      GraftCli.run(spark, Seq("-o", wh.toString,
        "--delete-study-by-id", "MTRIALA", "--force-start"))
    } finally core.Publish.testFailAfterCommits = None
    assert(Files.exists(wh.resolve("_publish.manifest")))
    assert(GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-id", "MTRIALA", "--force-start")) == 0)
    assert(!Files.exists(wh.resolve("_publish.manifest")))
    assert(GraftCli.readTable(spark, wh, "observation_fact").count() == 0)
  }

  test("kill-point sweep: recovery restores a consistent star from EVERY commit index") {
    val wh = Files.createTempDirectory("graft-sweep-wh")
    val rootA = Files.createTempDirectory("graft-sweep-a")
    writeClinicalStudy(rootA, "Study A", "STRIALA")
    assert(GraftCli.run(spark, Seq("-o", wh.toString, rootA.toString)) == 0)
    val aFacts = GraftCli.readTable(spark, wh, "observation_fact")
      .filter(col("sourcesystem_cd") === "STRIALA").count()
    assert(aFacts > 0)

    // upload study B, then delete it with a kill after the k-th table
    // swap, for EVERY k until the batch completes without firing — each
    // kill index leaves a different mixed old/new star shape (whole-table
    // swaps, partition drops, already-committed tables) and recovery must
    // roll every one of them forward
    var k = 1
    var batchDone = false
    while (!batchDone && k <= 30) {
      val rootB = Files.createTempDirectory(s"graft-sweep-b$k")
      writeClinicalStudy(rootB, "Study B", "STRIALB")
      assert(GraftCli.run(spark, Seq("-o", wh.toString, rootB.toString)) == 0,
        s"k=$k: re-upload of study B failed")
      core.Publish.testFailAfterCommits = Some(k)
      val killed =
        try {
          GraftCli.run(spark, Seq("-o", wh.toString,
            "--delete-study-by-id", "STRIALB", "--force-start"))
          false
        } catch { case _: IllegalStateException => true }
        finally core.Publish.testFailAfterCommits = None
      if (!killed) {
        batchDone = true // fewer than k tables in the batch: normal finish
      } else {
        assert(Files.exists(wh.resolve("_publish.manifest")), s"k=$k")
        assert(core.Publish.recoverPublish(spark, wh), s"k=$k")
      }
      assert(!Files.exists(wh.resolve("_publish.manifest")), s"k=$k")
      // post-delete consistency, identical for every kill index
      assert(GraftCli.readTable(spark, wh, "observation_fact")
        .filter(col("sourcesystem_cd") === "STRIALB").count() == 0, s"k=$k")
      assert(GraftCli.readTable(spark, wh, "i2b2")
        .filter(col("sourcesystem_cd") === "STRIALB").count() == 0, s"k=$k")
      assert(GraftCli.readTable(spark, wh, "observation_fact")
        .filter(col("sourcesystem_cd") === "STRIALA").count() == aFacts, s"k=$k")
      val leftovers = scala.collection.mutable.ArrayBuffer.empty[String]
      val walk = Files.walk(wh)
      try walk.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".tmp") || n.endsWith(".old") || n.startsWith("_old_"))
          leftovers += n
      } finally walk.close()
      assert(leftovers.isEmpty, s"k=$k: staging leftovers $leftovers")
      k += 1
    }
    assert(batchDone, "sweep never reached a kill-free batch — raise the bound")
    assert(k > 3, "batch had suspiciously few commits — sweep did not exercise recovery")
  }
}

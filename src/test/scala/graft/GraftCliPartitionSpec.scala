package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

/** The partitioned-warehouse contract: the star's big tables are
  * hive-partitioned by trial, so an upload touches ONLY its own study's
  * partitions (checked by file paths + mtimes), patient ids stay
  * warehouse-unique across studies (the reference's global sequence), a
  * re-upload reuses the study's existing patient ids, and a delete drops
  * the study's partition dirs while the table stays readable. */
class GraftCliPartitionSpec extends SparkSpec {

  private def writeClinicalStudy(root: Path, study: String, trial: String): Unit = {
    val dir = root.resolve(study).resolve("ClinicalDataToUpload")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("DEMO.txt"),
      s"""STUDY_ID\tSUBJ_ID\tAge\tSex
         |$trial\tP01\t61\tMale
         |$trial\tP02\t54\tFemale
         |$trial\tP03\t48\tFemale
         |""".stripMargin)
    Files.writeString(dir.resolve("MAP_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "DEMO.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "DEMO.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t3\tAge\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t4\tSex\t\t\t\n")
  }

  /** (relative path -> mtime) of every data file under a table's
    * partition dir. */
  private def partitionFiles(wh: Path, table: String, dir: String): Map[String, Long] = {
    val p = wh.resolve(s"$table.parquet").resolve(dir)
    if (!Files.isDirectory(p)) Map.empty
    else {
      val s = Files.walk(p)
      try {
        val b = Map.newBuilder[String, Long]
        s.filter(Files.isRegularFile(_)).forEach(f =>
          b += (p.relativize(f).toString -> Files.getLastModifiedTime(f).toMillis))
        b.result()
      } finally s.close()
    }
  }

  test("second study's upload leaves the first study's partitions untouched") {
    val wh = Files.createTempDirectory("graft-part-wh")
    val rootA = Files.createTempDirectory("graft-part-a")
    val rootB = Files.createTempDirectory("graft-part-b")
    writeClinicalStudy(rootA, "Study A", "TRIALA")
    writeClinicalStudy(rootB, "Study B", "TRIALB")

    assert(GraftCli.run(spark, Seq("-o", wh.toString, rootA.toString)) == 0)
    val factDirA = "sourcesystem_cd=TRIALA"
    val factsA = partitionFiles(wh, "observation_fact", factDirA)
    val patsA = partitionFiles(wh, "patient_dimension", "trial=TRIALA")
    assert(factsA.nonEmpty && patsA.nonEmpty)

    assert(GraftCli.run(spark, Seq("-o", wh.toString, rootB.toString)) == 0)
    // study A's fact + patient partitions: same files, same mtimes —
    // study B's upload wrote only its own partitions
    assert(partitionFiles(wh, "observation_fact", factDirA) == factsA)
    assert(partitionFiles(wh, "patient_dimension", "trial=TRIALA") == patsA)
    assert(partitionFiles(wh, "observation_fact", "sourcesystem_cd=TRIALB").nonEmpty)

    // patient ids are warehouse-unique across studies (the round-5 advice
    // finding: per-study dense ranks collided) and each usubjid has one id
    val pats = GraftCli.readTable(spark, wh, "patient_dimension")
    assert(pats.count() == 6)
    assert(pats.select("patient_num").distinct().count() == 6)

    // a re-upload of study B REUSES its existing patient ids
    val idsBefore = pats.filter(col("sourcesystem_cd").startsWith("TRIALB:"))
      .collect().map(r => r.getAs[String]("sourcesystem_cd") ->
        r.getAs[Long]("patient_num")).toMap
    val dirB = rootB.resolve("_DONE_Study B")
    assert(GraftCli.uploadClinical(spark, dirB.resolve("ClinicalDataToUpload"),
      "\\Public Studies", "Study B", wh, alwaysSetVisitName = false) == "TRIALB")
    val idsAfter = GraftCli.readTable(spark, wh, "patient_dimension")
      .filter(col("sourcesystem_cd").startsWith("TRIALB:"))
      .collect().map(r => r.getAs[String]("sourcesystem_cd") ->
        r.getAs[Long]("patient_num")).toMap
    assert(idsAfter == idsBefore)
    // and study A STILL untouched after the re-upload
    assert(partitionFiles(wh, "observation_fact", factDirA) == factsA)

    // delete drops the study's partition dirs; the tables stay readable
    assert(GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-id", "TRIALB")) == 0)
    assert(!Files.isDirectory(
      wh.resolve("observation_fact.parquet").resolve("sourcesystem_cd=TRIALB")))
    assert(!Files.isDirectory(
      wh.resolve("patient_dimension.parquet").resolve("trial=TRIALB")))
    assert(GraftCli.readTable(spark, wh, "observation_fact")
      .filter(col("sourcesystem_cd") === "TRIALB").count() == 0)
    assert(partitionFiles(wh, "observation_fact", factDirA) == factsA)

    // deleting the LAST study leaves zero-row but readable tables
    assert(GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-id", "TRIALA")) == 0)
    assert(spark.read.parquet(wh.resolve("observation_fact.parquet").toString)
      .count() == 0)
    assert(GraftCli.readTable(spark, wh, "patient_dimension").count() == 0)
  }

  test("partition value escaping round-trips Hive-special characters") {
    for (v <- Seq("GSE0:VCFTEST", "A B", "x=y", "a/b\\c", "100%", "plain"))
      assert(core.Publish.unescapePartVal(core.Publish.escapePartVal(v)) == v)
    assert(core.Publish.escapePartVal("GSE0:VCFTEST") == "GSE0%3AVCFTEST")
  }
}

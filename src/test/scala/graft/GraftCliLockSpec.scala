package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

/** The CLI's operability layer: the per-warehouse process lock
  * (ProcessLocker.groovy / CommandLineTool.groovy:76-86) and config-file
  * defaults (CommandLineTool.groovy:100-107) with flags winning. */
class GraftCliLockSpec extends SparkSpec {

  private def writeStudy(root: Path, trial: String): Unit = {
    val dir = root.resolve(s"Study $trial").resolve("ClinicalDataToUpload")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("DEMO.txt"),
      s"STUDY_ID\tSUBJ_ID\tAge\n$trial\tP01\t61\n")
    Files.writeString(dir.resolve("MAP_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "DEMO.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "DEMO.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t3\tAge\t\t\t\n")
  }

  test("a locked warehouse refuses a second run and leaves the star untouched") {
    val wh = Files.createTempDirectory("graft-lock-wh")
    val root = Files.createTempDirectory("graft-lock-root")
    writeStudy(root, "LOCK1")

    // simulate a concurrent (or crashed) loader holding the lock
    Files.createFile(wh.resolve(".graft-etl.lock"))
    assert(GraftCli.run(spark, Seq("-o", wh.toString, root.toString)) == 1)
    // nothing was uploaded, the study folder was not even marked
    assert(!Files.exists(wh.resolve("observation_fact.parquet")))
    assert(Files.isDirectory(root.resolve("Study LOCK1")))

    // --force-start removes the leftover lock and proceeds
    assert(GraftCli.run(spark, Seq("-o", wh.toString, "--force-start",
      root.toString)) == 0)
    assert(GraftCli.readTable(spark, wh, "observation_fact")
      .filter(col("sourcesystem_cd") === "LOCK1").count() > 0)
    // the lock is released after a successful run
    assert(!Files.exists(wh.resolve(".graft-etl.lock")))
  }

  test("config file supplies defaults, command-line flags win") {
    val wh = Files.createTempDirectory("graft-conf-wh")
    val whFlag = Files.createTempDirectory("graft-conf-wh2")
    val root = Files.createTempDirectory("graft-conf-root")
    writeStudy(root, "CONF1")
    val conf = Files.createTempDirectory("graft-conf").resolve("graft.conf")
    Files.writeString(conf,
      s"""# site defaults
         |output = $wh
         |parent_node = \\Config Studies
         |secure_study = true
         |""".stripMargin)

    // config-driven upload: warehouse, parent node and secure flag all
    // come from the file
    assert(GraftCli.run(spark, Seq("-c", conf.toString, root.toString)) == 0)
    val i2b2 = GraftCli.readTable(spark, wh, "i2b2")
    assert(i2b2.filter(col("c_fullname")
      .startsWith("\\Config Studies\\Study CONF1\\")).count() > 0)
    assert(GraftCli.readTable(spark, wh, "search_secure_object")
      .filter(col("bio_data_unique_id") === "EXP:CONF1").count() == 1)

    // flags override the file: -o wins over `output`
    val root2 = Files.createTempDirectory("graft-conf-root2")
    writeStudy(root2, "CONF2")
    assert(GraftCli.run(spark, Seq("-c", conf.toString,
      "-o", whFlag.toString, root2.toString)) == 0)
    assert(Files.exists(whFlag.resolve("observation_fact.parquet")))
    assert(GraftCli.readTable(spark, whFlag, "observation_fact")
      .filter(col("sourcesystem_cd") === "CONF2").count() > 0)

    // parse errors surface cleanly
    assert(GraftCli.parseArgs(Seq("-c", "/nonexistent/graft.conf")).isLeft)
    val bad = conf.resolveSibling("bad.conf")
    Files.writeString(bad, "unknown_key = 1\n")
    assert(GraftCli.parseArgs(Seq("-c", bad.toString)).isLeft)
  }
}

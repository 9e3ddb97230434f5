package graft.core

import graft.SparkSpec
import java.nio.file.Files

class StudyDiscoverySpec extends SparkSpec {

  test("discovery: data-dir convention, skip markers, parent path nesting") {
    val root = Files.createTempDirectory("graft-root")
    val s1 = Files.createDirectories(root.resolve("Oncology/Study A/ClinicalDataToUpload"))
    Files.createDirectories(root.resolve("Oncology/Study A/ExpressionData"))
    Files.createDirectories(root.resolve("_DONE_Study B/ClinicalData"))
    Files.createDirectories(root.resolve("Plain Folder/Nothing Here"))

    val found = StudyDiscovery.discover(root, "\\Public Studies")
    assert(found.size == 1)
    val st = found.head
    assert(st.studyLabel == "Study A")
    assert(st.parentPath == "\\Public Studies\\Oncology")
    assert(st.dataTypes.keySet == Set("Clinical", "Expression"))

    val done = StudyDiscovery.markProcessed(st.path, success = true)
    assert(done.getFileName.toString == "_DONE_Study A")
  }
}

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("audit log records steps, rowcounts, failures") {
    val audit = new Audit("job-1")
    val df = audit.logStep("load", countRows = true) {
      Seq(1, 2, 3).toDF("x")
    }
    assert(df.count() == 3)
    intercept[RuntimeException] {
      audit.logStep("boom")(throw new RuntimeException("nope"))
    }
    val es = audit.entries
    assert(es.map(_.status) == Seq("Done", "FAIL"))
    assert(es.head.rowCount == 3)
    assert(audit.toDF(spark).count() == 2)
  }
}

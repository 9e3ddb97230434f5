package graft.pipeline

import graft.SparkSpec
import graft.sources.ClinicalMapping.VariableType
import graft.sources.ValidationRules

/** Golden test of the SummaryStatistic.txt emitter — the same semantics
  * the reference asserts line-by-line against ExpectedSummaryStatistic.txt
  * (StatisticCollector.groovy:46-85): exact numeric stats incl. Tukey IQR,
  * factor counts, required/missing QC, per-rule violation id lists. */
class SummaryStatisticSpec extends SparkSpec {
  import spark.implicits._

  private val demo = Seq(
    ("S1", "10", "Male", "Ann"),
    ("S2", "20", "Female", "Bob"),
    ("S3", "30", "Female", "Cid"),
    ("S4", "40", "", "Dee"),
    ("S5", "", "Male", "Eve"))
    .toDF("SUBJ_ID", "Age", "Sex", "Name")

  private val vars = Seq(
    SummaryStatistic.VariableSpec("Age", VariableType.Numerical,
      ValidationRules.parse(
        "required; >15; 10-35; >25, when \"Sex\" is equal to \"Male\"")),
    SummaryStatistic.VariableSpec("Sex", VariableType.Categorical,
      ValidationRules.parse("required")),
    SummaryStatistic.VariableSpec("Name", VariableType.Text, Seq.empty))

  test("golden report rows: stats, factor counts, QC columns") {
    val rows = SummaryStatistic.forFile("DEMO.txt", demo, "SUBJ_ID", vars)
      .map(_.toSeq.map(v => if (v == null) "" else v.toString))

    assert(rows(0) == Seq("DEMO.txt", "Age", "Numerical", "4", "1",
      "25.0", "25.0", "20.0", "10.0", "40.0", "12.909944", "",
      "Yes", ">15; 10-35; >25, when \"Sex\" is equal to \"Male\"",
      "1 missing ('S5')",
      // first-appearance order: S1 violates >15 and the conditional rule
      // in row 1; 10-35 first violates at S4's row
      "Range checks failed: >15 ('S1'); " +
        ">25, when \"Sex\" is equal to \"Male\" ('S1'); 10-35 ('S4')"))

    assert(rows(1) == Seq("DEMO.txt", "Sex", "Categorical", "4", "1",
      "", "", "", "", "", "", "Female: 2, Male: 2",
      "Yes", "", "1 missing ('S4')", ""))

    assert(rows(2) == Seq("DEMO.txt", "Name", "Text", "5", "0",
      "", "", "", "", "", "", "", "", "", "", ""))
  }

  test("condition parse order mirrors the reference: range grammar first") {
    // ValidationRule.groovy:70-90 — parseRuleCondition tries the range
    // grammar before equality; a dash inside an equality value makes the
    // range pattern claim the condition, and its non-numeric bounds drop
    // the WHOLE rule (hard drop, not a fallthrough to equality)
    assert(ValidationRules.parse(">10, when \"Visit\" is equal to \"Follow-up\"").isEmpty)
    // numeric range / equality / presence / blank conditions still parse
    assert(ValidationRules.parse(">10, when \"Age\" is 10-20").length == 1)
    assert(ValidationRules.parse(">10, when \"Sex\" is equal to \"Male\"").length == 1)
    assert(ValidationRules.parse(">10, when \"Sex\" is present").length == 1)
    assert(ValidationRules.parse(">10, when \"Sex\" is blank or empty").length == 1)
  }

  test("edge cases: all-empty numeric column, no required rule") {
    val df = Seq(("S1", ""), ("S2", "")).toDF("SUBJ_ID", "V")
    val specs = Seq(SummaryStatistic.VariableSpec("V",
      VariableType.Numerical, ValidationRules.parse(">0")))
    val r = SummaryStatistic.forFile("F.txt", df, "SUBJ_ID", specs)(0)
    assert(r.getLong(3) == 0L && r.getLong(4) == 2L)
    assert(r.getString(14) == "") // not required -> no QC missing
    assert(r.getString(15) == "All values are empty")
  }

  test("unparsable numeric values: divisors include them, type violation in QC") {
    // VariableStatistic.groovy:149-170: notEmptyValuesCount++ happens BEFORE
    // Double.parseDouble, so "abc" counts into the mean/SD divisors and
    // records a "Type is Numerical" violation.
    val df = Seq(("S1", "10"), ("S2", "20"), ("S3", "abc"), ("S4", ""))
      .toDF("SUBJ_ID", "V")
    val specs = Seq(SummaryStatistic.VariableSpec("V",
      VariableType.Numerical, ValidationRules.parse(">0")))
    val r = SummaryStatistic.forFile("F.txt", df, "SUBJ_ID", specs)(0)
      .toSeq.map(v => if (v == null) "" else v.toString)
    assert(r(3) == "3" && r(4) == "1") // N counts "abc", null counts ""
    assert(r(5) == "10.0") // mean = (10+20)/3, divisor includes "abc"
    assert(r(6) == "15.0") // median over parsed values only
    assert(r(8) == "10.0" && r(9) == "20.0")
    // sdBase = (100+400) - 30^2/3 = 200; sd = sqrt(200/2) = 10.0
    assert(r(10) == "10.0")
    assert(r(15) == "Range checks failed: Type is Numerical ('S3')")
  }

  test("type violation suppressed without range checks (getQCRangeCheck)") {
    val df = Seq(("S1", "10"), ("S2", "abc")).toDF("SUBJ_ID", "V")
    val specs = Seq(SummaryStatistic.VariableSpec("V",
      VariableType.Numerical, Seq.empty))
    val r = SummaryStatistic.forFile("F.txt", df, "SUBJ_ID", specs)(0)
    assert(r.getString(15) == "") // hasRangeChecks false -> empty, like the reference
  }

  test("GSE0 fixture report matches ExpectedSummaryStatistic.txt byte-for-byte") {
    // ClinicalDataProcessorTest 'it should produce SummaryStatistic.txt':
    // actualFile.readLines() == expectedFile.readLines() over the real
    // fixture. Variables are the file columns in mapping order with
    // SUBJ_ID as the implicit ID variable; names come from the FILE
    // headers (collectVariableValue uses csvFile.header), types/rules
    // from the mapping.
    import graft.sources.{ClinicalMapping, TsvReader}
    val dir = "/root/reference/fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark, s"$dir/Test Study_GSE0_Mapping_File.txt")
    val specials = Set("STUDY_ID", "SUBJ_ID", "SITE_ID", "VISIT_NAME", "SAMPLE_ID")
    val files = mapping.files.map { f =>
      val header = TsvReader.header(spark, s"$dir/$f")
      val entries = mapping.forFile(f)
        .filterNot(e => specials.contains(e.dataLabel.toUpperCase))
      val seen = scala.collection.mutable.LinkedHashSet.empty[Int]
      val dataVars = entries.flatMap { e =>
        if (seen.add(e.colNbr))
          Some(SummaryStatistic.VariableSpec(header(e.colNbr - 1),
            e.variableType.getOrElse(ClinicalMapping.VariableType.Text),
            e.validationRules))
        else None
      }
      val vars = SummaryStatistic.VariableSpec("SUBJ_ID",
        ClinicalMapping.VariableType.Id, Seq.empty) +: dataVars
      (f, TsvReader.read(spark, s"$dir/$f"), "SUBJ_ID", vars)
    }
    val out = java.nio.file.Files.createTempDirectory("graft-golden").toString
    SummaryStatistic.write(spark, out, files)
    val written = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val actual = java.nio.file.Files.readAllLines(written.toPath)
    val expected = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/ExpectedSummaryStatistic.txt"))
    assert(actual.size == expected.size)
    actual.toArray.zip(expected.toArray).zipWithIndex.foreach {
      case ((a, e), i) => assert(a == e, s"line ${i + 1} differs")
    }
  }

  test("report frame writes the reference's 16 tab-separated columns") {
    val df = SummaryStatistic.report(spark,
      Seq(("DEMO.txt", demo, "SUBJ_ID", vars)))
    assert(df.columns.toSeq == SummaryStatistic.ReportColumns)
    assert(df.count() == 3)
    val out = java.nio.file.Files.createTempDirectory("graft-sumstat").toString
    SummaryStatistic.write(spark, out, Seq(("DEMO.txt", demo, "SUBJ_ID", vars)))
    val lines = spark.read.textFile(out).collect()
    assert(lines.exists(_.startsWith("File\tVariable\tVariable Type")))
    assert(lines.exists(_.contains("12.909944")))
  }
}

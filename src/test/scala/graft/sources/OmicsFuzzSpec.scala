package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fuzz coverage for the omics melt/read surface — matrix, RBM-long and
  * SNP files are user-shaped TSVs, so under default-ANSI Spark 4 the
  * contract is the reader-fuzz discipline established for TSV/VCF/AVI:
  * malformed CELLS become nulls (the raw value survives for audit) or
  * dropped rows, structurally broken FILES fail with a named error, and
  * nothing ever throws out of a scan task. */
class OmicsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def write(content: String): String = {
    val f = Files.createTempFile("omicsfuzz", ".txt")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("meltMatrix: garbage cells null the intensity, raw value survives") {
    val m = Seq(
      ("p1", "1.5", "abc"),
      ("p2", "", "2e3"),
      ("p3", "NaN-ish", "-0.25")).toDF("ID_REF", "S1", "S2")
    val out = OmicsSources.meltMatrix(m).collect()
      .map(r => (r.getAs[String]("probeset_id"), r.getAs[String]("sample_id")) ->
        ((r.getAs[String]("raw_value"), Option(r.getAs[java.lang.Double]("intensity_value")))))
      .toMap
    assert(out(("p1", "S1")) == (("1.5", Some(1.5))))
    assert(out(("p1", "S2")) == (("abc", None)))       // cell, not scan, fails
    assert(!out.contains(("p2", "S1")))                 // empty cell dropped
    assert(out(("p2", "S2")) == (("2e3", Some(2000.0))))
    assert(out(("p3", "S1")) == (("NaN-ish", None)))
    assert(out(("p3", "S2")) == (("-0.25", Some(-0.25))))
  }

  test("meltMatrix: hostile sample headers (quotes/backticks) still melt") {
    val m = Seq(("p1", "1.0", "2.0"))
      .toDF("ID_REF", "O'Brien", "sam`ple")
    val out = OmicsSources.meltMatrix(m).collect()
      .map(r => r.getAs[String]("sample_id") -> r.getAs[java.lang.Double]("intensity_value"))
      .toMap
    assert(out == Map("O'Brien" -> 1.0, "sam`ple" -> 2.0))
    // a matrix with no sample columns fails with a named error, not a
    // malformed generated stack()
    val e = intercept[IllegalArgumentException](
      OmicsSources.meltMatrix(Seq(Tuple1("p1")).toDF("ID_REF")))
    assert(e.getMessage.contains("sample columns"))
  }

  test("readRbmLong: non-numeric AVALUE nulls intensity; short header is named") {
    val path = write(Seq(
      "A\tB\tSAMPID\tD\tE\tANALYTE (unit)\tG\tAVALUE",
      "x\tx\ts1\tx\tx\tan1\tx\t7.5",
      "x\tx\ts2\tx\tx\tan2\tx\tgarbage",
      "x\tx\t\tx\tx\tan3\tx\t1.0").mkString("\n"))
    val out = OmicsSources.readRbmLong(TsvReader.read(spark, path)).collect()
      .map(r => r.getAs[String]("sample_id") ->
        Option(r.getAs[java.lang.Double]("intensity_value"))).toMap
    assert(out == Map("s1" -> Some(7.5), "s2" -> None)) // empty SAMPID row dropped
    val bad = write("A\tB\tC\nx\tx\tx")
    val e = intercept[IllegalArgumentException](
      OmicsSources.readRbmLong(TsvReader.read(spark, bad)))
    assert(e.getMessage.contains("Incorrect RBM data file"))
  }

  test("SNP copy-number: malformed position/value cells null out; files with too few columns are named") {
    val path = write(Seq(
      "GSM\tSNP\tCHR\tPOS\tCN",
      "g1\trs1\t1\t12345\t2.0",
      "g2\trs2\t2\tnot-a-pos\t1.5",
      "g3\trs3\t3\t777\tNaNsense").mkString("\n"))
    val out = graft.pipeline.SnpAndSerial
      .readSnpCopyNumber(spark, Seq(path)).collect()
      .map(r => r.getAs[String]("gsm_num") ->
        ((Option(r.getAs[java.lang.Long]("chrom_pos")),
          Option(r.getAs[java.lang.Double]("copy_number"))))).toMap
    assert(out("g1") == ((Some(12345L), Some(2.0))))
    assert(out("g2") == ((None, Some(1.5))))
    assert(out("g3") == ((Some(777L), None)))
    val bad = write("A\tB\nx\ty")
    val e = intercept[IllegalArgumentException](
      graft.pipeline.SnpAndSerial.readSnpCopyNumber(spark, Seq(bad)).collect())
    assert(e.getMessage.contains("needs 5 columns"))
    val badCalls = write("A\nx")
    val e2 = intercept[IllegalArgumentException](
      graft.pipeline.SnpAndSerial.readSnpCalls(spark, Seq(badCalls)).collect())
    assert(e2.getMessage.contains("needs 3 columns"))
  }

  test("aCGH platform: malformed coordinates null out, organism falls back") {
    val path = write(Seq(
      "#SPECIES: Homo sapiens",
      "GPL\tREGION\tCHR\tSTART\tEND\tNPROBES\tCYTO\tSYM\tGENEID\tORG",
      "x\tr1\t1\t100\t200\t5\tq1\tTP53\t7157\t",
      "x\tr2\t2\tbroken\t300\tmany\tq2\t\tnot-a-gene-id\t").mkString("\n"))
    val (meta, staged) = graft.pipeline.ChromRegion
      .readAcghPlatform(spark, path, "GPLX")
    assert(meta("SPECIES") == "Homo sapiens")
    val rows = staged.collect().map(r => r.getAs[String]("region_name") ->
      ((Option(r.getAs[java.lang.Integer]("start_bp")),
        Option(r.getAs[java.lang.Integer]("num_probes")),
        Option(r.getAs[java.lang.Long]("gene_id")),
        r.getAs[String]("organism")))).toMap
    assert(rows("r1") == ((Some(100), Some(5), Some(7157L), "Homo sapiens")))
    assert(rows("r2") == ((None, None, None, "Homo sapiens")))
  }
}

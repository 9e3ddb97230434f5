package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

/** End-to-end drive of the operations driver: crawl a fixture directory
  * (one clinical study + the reference's aCGH fixture), load into a
  * parquet warehouse, verify `_DONE_` marking, then run the maintenance
  * operations (--move-study, --delete-study-by-path) over the warehouse —
  * the CommandLineTool.groovy flow on the lakehouse star. */
class GraftCliSpec extends SparkSpec {

  private def writeClinicalStudy(root: Path): Unit = {
    val dir = root.resolve("Study CLI").resolve("ClinicalDataToUpload")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("DEMO.txt"),
      """STUDY_ID	SUBJ_ID	Age	Sex
        |GSCLI	P01	61	Male
        |GSCLI	P02	54	Female
        |GSCLI	P03	48	Female
        |""".stripMargin)
    Files.writeString(dir.resolve("CLI_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "DEMO.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "DEMO.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t3\tAge\t\t\t\n" +
      "DEMO.txt\tSubjects+Demographics\t4\tSex\t\t\t\n")
  }

  private def copyAcghFixture(root: Path): Unit = {
    val src = java.nio.file.Paths.get(
      "/root/reference/fixtures/Test Studies/Test Study_GSE0/ACGHDataToUpload")
    val dir = root.resolve("Study ACGH").resolve("ACGHDataToUpload")
    Files.createDirectories(dir)
    Files.list(src).forEach { f =>
      Files.copy(f, dir.resolve(f.getFileName.toString))
    }
  }

  private def copyExpressionFixture(root: Path): Unit = {
    // ONE study folder with TWO datatype dirs (expression + VCF), both
    // trial GSE0 — the multi-datatype layout the reference crawls
    for (dt <- Seq("ExpressionDataToUpload", "VCFDataToUpload")) {
      val src = java.nio.file.Paths.get(
        s"/root/reference/fixtures/Test Studies/Test Study_GSE0/$dt")
      val dir = root.resolve("Study GEX").resolve(dt)
      Files.createDirectories(dir)
      Files.list(src).forEach { f =>
        Files.copy(f, dir.resolve(f.getFileName.toString))
      }
    }
  }

  test("upload + mark + move + delete over the parquet warehouse") {
    val root = Files.createTempDirectory("graft-cli-root")
    val wh = Files.createTempDirectory("graft-cli-wh")
    writeClinicalStudy(root)
    copyAcghFixture(root)
    copyExpressionFixture(root)

    // --- upload run: all three studies load, folders marked _DONE_
    val code = GraftCli.run(spark, Seq(
      "-o", wh.toString, "--parent-node", "\\Public Studies",
      "--secure-study", root.toString))
    assert(code == 0)
    val marked = Files.list(root).iterator()
    val names = {
      val b = Seq.newBuilder[String]
      marked.forEachRemaining(p => b += p.getFileName.toString)
      b.result().sorted
    }
    assert(names == Seq("_DONE_Study ACGH", "_DONE_Study CLI", "_DONE_Study GEX"))

    // clinical star landed
    val i2b2 = GraftCli.readTable(spark, wh, "i2b2")
    assert(i2b2.filter(col("c_fullname") ===
      "\\Public Studies\\Study CLI\\Subjects\\Demographics\\Sex\\Female\\").count() == 1)
    val facts = GraftCli.readTable(spark, wh, "observation_fact")
    assert(facts.filter(col("sourcesystem_cd") === "GSCLI" &&
      col("concept_cd") =!= "SECURITY").count() == 6)
    // --secure-study: one SECURITY fact per patient with the EXP token,
    // i2b2_secure re-tokened off the facts, secure object registered
    assert(facts.filter(col("sourcesystem_cd") === "GSCLI" &&
      col("concept_cd") === "SECURITY" &&
      col("tval_char") === "EXP:GSCLI").count() == 3)
    assert(GraftCli.readTable(spark, wh, "i2b2_secure")
      .filter(col("sourcesystem_cd") === "GSCLI" &&
        col("secure_obj_token") === "EXP:GSCLI").count() > 0)
    assert(GraftCli.readTable(spark, wh, "search_secure_object")
      .filter(col("bio_data_unique_id") === "EXP:GSCLI").count() == 1)
    assert(GraftCli.readTable(spark, wh, "bio_experiment")
      .filter(col("accession") === "GSCLI").count() == 1)
    // aCGH tables landed
    assert(spark.read.parquet(s"$wh/de_subject_acgh_data.parquet")
      .filter(col("trial_name") === "TSTA").count() > 0)
    assert(spark.read.parquet(s"$wh/de_chromosomal_region.parquet")
      .count() == 3422)
    // expression tables landed: registry, mapping, intensity fidelity
    // (ExpressionDataProcessorTest.groovy:55-74's raw-value check)
    assert(spark.read.parquet(s"$wh/de_mrna_annotation.parquet")
      .filter(col("gpl_id") === "GEX_TST").count() > 0)
    val gexMap = spark.read.parquet(s"$wh/de_subject_sample_mapping.parquet")
      .filter(col("trial_name") === "GSE0" && col("source_cd") === "STD")
    assert(gexMap.select("sample_cd").distinct().count() == 32)
    val assay719 = gexMap.filter(col("sample_cd") === "TST1000000719")
      .select("assay_id").distinct().collect()(0).getLong(0)
    val gexV = spark.read.parquet(s"$wh/de_subject_microarray_data.parquet")
      .filter(col("probeset_id") === "1007_s_at" && col("assay_id") === assay719)
      .collect()(0).getAs[Double]("raw_intensity")
    assert(math.abs(gexV - 6.624529839) < 0.001)
    // VCF dataset landed under the same trial: per-file dataset id, summary
    // rows carry warehouse-unique assay ids tied to the sample mapping
    assert(spark.read.parquet(s"$wh/de_variant_dataset.parquet")
      .collect().map(_.getString(0)).toSeq == Seq("GSE0:VCFTEST"))
    val vcfSummary = spark.read.parquet(s"$wh/de_variant_subject_summary.parquet")
    assert(vcfSummary.filter(col("assay_id").isNull).count() == 0)
    val vcfAssays = vcfSummary.select("assay_id").distinct().collect()
      .map(_.getLong(0)).toSet
    val mapAssays = spark.read
      .parquet(s"$wh/de_subject_sample_mapping.parquet")
      .filter(col("source_cd") === "VCF")
      .select("assay_id").collect().map(_.getLong(0)).toSet
    assert(vcfAssays.subsetOf(mapAssays) && vcfAssays.nonEmpty)

    // --- move the clinical study
    val mv = GraftCli.run(spark, Seq("-o", wh.toString,
      "--move-study", "\\Public Studies\\Study CLI;\\Archive\\Study CLI"))
    assert(mv == 0)
    val moved = GraftCli.readTable(spark, wh, "i2b2")
    assert(moved.filter(col("c_fullname").startsWith("\\Public Studies\\Study CLI"))
      .count() == 0)
    assert(moved.filter(col("c_fullname") ===
      "\\Archive\\Study CLI\\Subjects\\Demographics\\Sex\\Female\\").count() == 1)

    // an illegal move reports the reference's error and leaves the star alone
    val bad = GraftCli.run(spark, Seq("-o", wh.toString,
      "--move-study", "\\Nope\\Missing;\\Archive\\X"))
    assert(bad == 1)

    // --- delete it by path
    val del = GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-path", "\\Archive\\Study CLI"))
    assert(del == 0)
    val after = GraftCli.readTable(spark, wh, "i2b2")
    assert(after.filter(col("c_fullname").startsWith("\\Archive\\Study CLI"))
      .count() == 0)
    assert(GraftCli.readTable(spark, wh, "observation_fact")
      .filter(col("sourcesystem_cd") === "GSCLI").count() == 0)

    // --- delete the aCGH study by id: trial-keyed omics tables cascade
    val delAcgh = GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-id", "tsta"))
    assert(delAcgh == 0)
    assert(spark.read.parquet(s"$wh/de_subject_acgh_data.parquet").count() == 0)
    assert(GraftCli.readTable(spark, wh, "de_subject_sample_mapping")
      .filter(col("trial_name") === "TSTA").count() == 0)

    // --- delete the expression study: microarray facts + mapping cascade
    val delGex = GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-id", "gse0"))
    assert(delGex == 0)
    assert(spark.read.parquet(s"$wh/de_subject_microarray_data.parquet")
      .filter(col("trial_name") === "GSE0").count() == 0)
    assert(GraftCli.readTable(spark, wh, "de_subject_sample_mapping")
      .filter(col("trial_name") === "GSE0").count() == 0)
    // the VCF datasets cascade with the study (sample mapping x summary)
    assert(spark.read.parquet(s"$wh/de_variant_dataset.parquet").count() == 0)
    assert(spark.read.parquet(s"$wh/de_variant_subject_summary.parquet")
      .count() == 0)

    // --- option surface sanity (kept in this test; see the high-dim test
    // below for the remaining datatype uploads)
    assert(GraftCli.parseArgs(Seq("--bogus")).isLeft)
    assert(GraftCli.parseArgs(Seq("-m", "a")).isLeft)
    // a URI warehouse is refused with the local-path boundary named
    // (java.nio publish would silently create a local ./hdfs:/ dir)
    val uriErr = GraftCli.parseArgs(Seq("-o", "hdfs://nn/warehouse"))
    assert(uriErr.isLeft && uriErr.swap.toOption.get.contains("LOCAL"))
    val parsed = GraftCli.parseArgs(Seq("-n", "-s", "--secure-study",
      "--keep-security", "--check-duplicates", "--use-first-gene-id",
      "--always-set-visit-name", "-m", "x;y", "d")).toOption.get
    assert(parsed.noRename && parsed.stopOnFail && parsed.secureStudy &&
      parsed.keepSecurity && parsed.checkDuplicates && parsed.useFirstGeneId &&
      parsed.alwaysSetVisitName && parsed.moveStudy.contains(("x", "y")) &&
      parsed.dataDir.exists(_.toString == "d"))
  }

  test("failed study marks _FAIL_ and --stop-on-fail halts the crawl") {
    val root = Files.createTempDirectory("graft-cli-fail-root")
    val wh = Files.createTempDirectory("graft-cli-fail-wh")
    // study A (crawled first) has a clinical dir with NO mapping file
    val bad = root.resolve("A Bad Study").resolve("ClinicalDataToUpload")
    Files.createDirectories(bad)
    Files.writeString(bad.resolve("DEMO.txt"), "STUDY_ID\tSUBJ_ID\nX\tP1\n")
    writeClinicalStudy(root) // "Study CLI", crawled after "A Bad Study"

    val code = GraftCli.run(spark, Seq("-o", wh.toString,
      "--stop-on-fail", root.toString))
    assert(code == 1)
    val names = {
      val b = Seq.newBuilder[String]
      Files.list(root).forEach(p => b += p.getFileName.toString)
      b.result().sorted
    }
    // the bad study is marked _FAIL_; stop-on-fail left the good one alone
    assert(names == Seq("Study CLI", "_FAIL_A Bad Study"))

    // re-crawl: the _FAIL_ dir is skipped, the remaining study loads clean
    val code2 = GraftCli.run(spark, Seq("-o", wh.toString, root.toString))
    assert(code2 == 0)
    val names2 = {
      val b = Seq.newBuilder[String]
      Files.list(root).forEach(p => b += p.getFileName.toString)
      b.result().sorted
    }
    assert(names2 == Seq("_DONE_Study CLI", "_FAIL_A Bad Study"))
    assert(GraftCli.readTable(spark, wh, "observation_fact")
      .filter(col("sourcesystem_cd") === "GSCLI" &&
        col("concept_cd") =!= "SECURITY").count() == 6)
  }

  test("serial-HDD datatype: week XML stamped, sample dims, fact sample codes") {
    val root = Files.createTempDirectory("graft-cli-shdd-root")
    val wh = Files.createTempDirectory("graft-cli-shdd-wh")
    val src = java.nio.file.Paths.get(
      "/root/reference/fixtures/Test Studies/Test MirnaQpcr Study/MIRNA_QPCRSerialHDDDataToUpload")
    val dir = root.resolve("Test MirnaQpcr Study")
      .resolve("MIRNA_QPCRSerialHDDDataToUpload")
    Files.createDirectories(dir)
    Files.list(src).forEach { f =>
      Files.copy(f, dir.resolve(f.getFileName.toString))
    }
    val code = GraftCli.run(spark, Seq("-o", wh.toString,
      "--parent-node", "\\Test Studies", root.toString))
    assert(code == 0)
    // MIRNASerialHDDDataProcessorTest: 'Sample Factors Week 1' node
    // carries the verbatim 7-days XML after the serial apply step
    val wk1 = spark.read.parquet(s"$wh/i2b2.parquet")
      .filter(col("c_fullname") ===
        "\\Test Studies\\Test MirnaQpcr Study\\Sample Factors Week 1\\")
      .collect()(0).getAs[String]("c_metadataxml")
    assert(wk1 != null && wk1.contains("<Value>7</Value>") &&
      wk1.contains("<Unit>days</Unit>") &&
      wk1.contains("<DisplayName>Week 1</DisplayName>"))
    // both GSM samples registered; the study's facts carry sample codes
    assert(spark.read.parquet(s"$wh/sample_dimension.parquet")
      .collect().map(_.getString(0)).toSet == Set("GSM918938", "GSM918939"))
    val factSamples = spark.read.parquet(s"$wh/observation_fact.parquet")
      .filter(col("sourcesystem_cd") === "TEST005" &&
        col("concept_cd") =!= "SECURITY")
      .select("sample_cd").collect().map(_.getString(0)).toSet
    assert(factSamples == Set("GSM918938", "GSM918939"))
  }

  test("multi-VCF with configured paths: per-sample category nodes + counts") {
    val root = Files.createTempDirectory("graft-cli-vcfcp-root")
    val wh = Files.createTempDirectory("graft-cli-vcfcp-wh")
    val src = java.nio.file.Paths.get(
      "/root/reference/fixtures/Test Studies/Test Study_GSE0/MultiVCFDataWithConfiguredPaths")
    val dir = root.resolve("Study VCFCP").resolve("MultiVCFDataToUpload")
    Files.createDirectories(dir)
    Files.list(src).forEach { f =>
      Files.copy(f, dir.resolve(f.getFileName.toString))
    }
    val code = GraftCli.run(spark, Seq("-o", wh.toString,
      "--parent-node", "\\Test Studies", root.toString))
    assert(code == 0)
    // one dataset per file
    assert(spark.read.parquet(s"$wh/de_variant_dataset.parquet")
      .collect().map(_.getString(0)).toSet ==
      Set("GSE0:VCFTEST1", "GSE0:VCFTEST2", "GSE0:VCFTEST3"))
    // CATEGORY_CD became ontology leaves with per-sample counts
    val counts = spark.read.parquet(s"$wh/concept_counts.parquet")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(counts(
      "\\Test Studies\\Study VCFCP\\VCF\\Subjects\\Subject0\\") == 1L)
    assert(counts(
      "\\Test Studies\\Study VCFCP\\VCF\\Subjects\\Other\\") == 2L)
    assert(spark.read.parquet(s"$wh/i2b2.parquet")
      .filter(col("c_fullname") ===
        "\\Test Studies\\Study VCFCP\\VCF\\Subjects\\Other\\").count() == 1)
  }

  test("numeric-duplicate abort: _FAIL_ mark and duplicates.csv export") {
    val root = Files.createTempDirectory("graft-cli-dup-root")
    val wh = Files.createTempDirectory("graft-cli-dup-wh")
    val fixture = java.nio.file.Paths.get(
      "/root/reference/fixtures/Test Studies/Test Study With Duplicated Patient ID_GSE0DUPPID/ClinicalDataToUpload")
    val dir = root.resolve("Dup Study").resolve("ClinicalDataToUpload")
    Files.createDirectories(dir)
    Files.list(fixture).forEach { f =>
      Files.copy(f, dir.resolve(f.getFileName.toString))
    }
    val code = GraftCli.run(spark, Seq("-o", wh.toString,
      "--check-duplicates", root.toString))
    assert(code == 1)
    val marked = root.resolve("_FAIL_Dup Study")
    assert(Files.isDirectory(marked))
    // the exported CSV matches the reference's expected file line-set
    // (the reference emits table order; ours is sorted — documented)
    val written = Files.readAllLines(
      marked.resolve("ClinicalDataToUpload").resolve("duplicates.csv"))
    val expected = Files.readAllLines(fixture.resolve("ExpectedDuplicates.csv"))
    assert(written.get(0) == expected.get(0)) // header verbatim
    import scala.jdk.CollectionConverters._
    assert(written.asScala.drop(1).toSet ==
      expected.asScala.drop(1).filter(_.nonEmpty).toSet)
  }

  test("high-dim datatypes crawl through the CLI: rnaseq/protein/rbm/mirna/metabolomics") {
    val root = Files.createTempDirectory("graft-cli-hd-root")
    val wh = Files.createTempDirectory("graft-cli-hd-wh")
    val fixtures = Seq(
      ("Test RNASeq Study", "RNASeqDataToUpload"),
      ("Test Protein Study_GSE37425", "ProteinDataToUpload"),
      ("Test RBM Study", "RBMDataToUpload"),
      ("Test MirnaQpcr Study", "MIRNA_QPCRDataToUpload"),
      ("Test MirnaSeq Study", "MIRNA_SEQDataToUpload"),
      ("Test Metabolomics Study", "MetabolomicsDataToUpload"),
      ("Test SNP Study", "SNPDataToUpload"),
      ("Test Study With GWAS Plink_GSE0GWASPLINK", "GWASPlinkDataToUpload"))
    for ((study, dt) <- fixtures) {
      // the SNP fixture lives inside Test Study_GSE0; give it its own
      // study folder so its trial doesn't collide in this crawl
      val srcStudy =
        if (dt == "SNPDataToUpload") "Test Study_GSE0" else study
      val src = java.nio.file.Paths.get(
        s"/root/reference/fixtures/Test Studies/$srcStudy/$dt")
      val dir = root.resolve(study).resolve(dt)
      Files.createDirectories(dir)
      Files.list(src).forEach { f =>
        Files.copy(f, dir.resolve(f.getFileName.toString))
      }
    }
    val code = GraftCli.run(spark, Seq(
      "-o", wh.toString, "--parent-node", "\\Test Studies", root.toString))
    assert(code == 0)

    def facts(table: String) = spark.read.parquet(s"$wh/$table.parquet")
    def row(table: String, trial: String, probe: String, sample: String) =
      facts(table).filter(col("trial_name") === trial &&
        col("probeset_id") === probe && col("sample_id") === sample)
        .collect()(0)

    // RNASeq: raw value arrives untransformed (RNASeqDataProcessorTest)
    val rna = row("de_subject_rna_data", "GSE_A_37424", "NM_025300", "S57023")
    assert(rna.getAs[Double]("raw_intensity") == 1.9108)
    // Protein: proteomics flavor log2(avg + 0.001) rounded to 4 dp
    // (ProteinDataProcessorTest testItMergeSamples first load)
    val prot = row("de_subject_protein_data", "GSE37425",
      "RPPGFSPFR(QTF-2)", "O00231")
    assert(prot.getAs[Double]("log_intensity") == 22.6096)
    // RBM: long-format read + rbm zero-guard log; unit suffix survives
    // into the fact key (RBMDataProcessorTest z ~ -0.7071 for P15514)
    val rbm = facts("de_subject_rbm_data")
      .filter(col("trial_name") === "TESTRBM" &&
        col("sample_id") === "GA8015ZS-06" &&
        col("probeset_id").startsWith("Amphiregulin")).collect()(0)
    assert(math.abs(rbm.getAs[Double]("zscore") - (-0.7071)) < 1e-3)
    // miRNA qPCR: dCt negation (MIRNAQpcrDataProcessorTest)
    val qpcr = row("de_subject_mirna_data", "TEST005", "1", "GSM918938")
    assert(qpcr.getAs[Double]("log_intensity") == -0.113408)
    assert(math.abs(qpcr.getAs[Double]("zscore") - 0.70711) < 1e-4)
    // miRNA seq: round(log2, 5) with zero floor (MIRNASeqDataProcessorTest)
    val seq = row("de_subject_mirna_data", "MIRNASEQBASED", "16", "GSM918944")
    assert(seq.getAs[Double]("log_intensity") == -2.61429)
    assert(math.abs(seq.getAs[Double]("zscore") - 1.05828) < 1e-4)
    // Metabolomics: combined annotation+matrix melt keeps raw intensities
    val met = row("de_subject_metabolomics_data", "GSE37427", "HMDB0TEST", "14PP")
    assert(math.abs(met.getAs[Double]("raw_intensity") - 5095.0) < 0.001)

    // LOAD_SAMPLES ontology landed in the warehouse star: the replay
    // specs' node paths and tree rollups, via the CLI this time
    val i2b2 = facts("i2b2")
    val counts = facts("concept_counts")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val rnaLeaf =
      "\\Test Studies\\Test RNASeq Study\\Biomarker Data\\RNASeq999\\Intestine\\Test\\"
    assert(i2b2.filter(col("c_fullname") === rnaLeaf).count() == 1)
    assert(counts(rnaLeaf) == 2L)
    val mirnaSeqLeaf =
      "\\Test Studies\\Test MirnaSeq Study\\Biomarker Data\\Test MIRNAseq Platform\\Synovium\\"
    assert(counts(mirnaSeqLeaf) == 8L)
    assert(counts(
      "\\Test Studies\\Test Metabolomics Study\\Biomarker Data\\Test Metabolomics Platform\\") == 10L)

    // SNP: positional per-sample file reads, full-outer calls/copy-number
    // merge (SNPDataProcessorTest: TST001 x SNP_A-4265338 has cn only)
    val snp = facts("de_sample_snp_data")
      .filter(col("trial_name") === "GSE0" && col("sample_id") === "TST001" &&
        col("snp_name") === "SNP_A-4265338").collect()(0)
    assert(snp.isNullAt(snp.fieldIndex("snp_calls")))
    assert(snp.getAs[Double]("copy_number") == 0.628913)
    assert(!snp.isNullAt(snp.fieldIndex("assay_id")))

    // GWAS Plink: bed/bim/fam LOB rows land trial-keyed; fam IIDs map as
    // samples (GWASPlinkDataProcessorTest: 6 patients, 3 LOB files)
    assert(facts("plink_data")
      .filter(col("trial_name") === "GSE0GWASPLINK").count() == 3)
    assert(facts("de_subject_sample_mapping")
      .filter(col("trial_name") === "GSE0GWASPLINK")
      .select("patient_id").distinct().count() == 6)

    // assay ids are warehouse-unique across the six uploads and tie the
    // facts to the sample mapping
    val mapping = facts("de_subject_sample_mapping")
    assert(mapping.groupBy("assay_id").count()
      .filter(col("count") > 1).count() == 0)
    val rnaAssay = rna.getAs[Long]("assay_id")
    assert(mapping.filter(col("assay_id") === rnaAssay)
      .collect()(0).getAs[String]("sample_cd") == "S57023")

    // deleting one study leaves the others' facts alone
    assert(GraftCli.run(spark, Seq("-o", wh.toString,
      "--delete-study-by-id", "TEST005")) == 0)
    val mirna = facts("de_subject_mirna_data")
    assert(mirna.filter(col("trial_name") === "TEST005").count() == 0)
    assert(mirna.filter(col("trial_name") === "MIRNASEQBASED").count() > 0)
  }
}

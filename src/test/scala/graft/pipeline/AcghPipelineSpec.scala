package graft.pipeline

import graft.SparkSpec
import graft.sources.{AcghMelt, TsvReader}
import org.apache.spark.sql.functions._

/** Replays the reference's ACGHDataProcessorTest against its own fixture
  * (testItLoadsData): chrom-region registry load from
  * TST_ACGH_region_platform.txt, then the full i2b2_process_acgh_data
  * build — sample mapping with platform 'ACGH', per-(region, sample)
  * de_subject_acgh_data facts.
  */
class AcghPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureDir =
    "/root/reference/fixtures/Test Studies/Test Study_GSE0/ACGHDataToUpload"

  private def emptyRegions = Seq.empty[(Long, String, String, String, Long)]
    .toDF("region_id", "gpl_id", "region_name", "gene_symbol", "gene_id")
  private def emptyGplInfo = Seq.empty[(String, String, String, String, String)]
    .toDF("platform", "title", "organism", "marker_type", "release_nbr")
  private def emptyBioMarkers = Seq.empty[(String, String, String, String)]
    .toDF("bio_marker_name", "organism", "primary_external_id", "bio_marker_type")
  private def emptyPatients = Seq.empty[(Long, String)]
    .toDF("patient_num", "sourcesystem_cd")

  private lazy val sampleMap = {
    val raw = TsvReader.read(spark,
      s"$fixtureDir/TSTA_Subject_Sample_Mapping_File.txt")
    raw.select(
      upper(col("STUDY_ID")).as("study_id"),
      when(length(coalesce(col("SITE_ID"), lit(""))) > 0, col("SITE_ID")).as("site_id"),
      col("SUBJECT_ID").as("subject_id"),
      col("SAMPLE_ID").as("sample_cd"),
      col("PLATFORM").as("platform"),
      when(length(coalesce(col("TISSUETYPE"), lit(""))) > 0, col("TISSUETYPE"))
        .as("tissue_type"),
      when(length(coalesce(col("ATTR1"), lit(""))) > 0, col("ATTR1")).as("attribute_1"),
      when(length(coalesce(col("ATTR2"), lit(""))) > 0, col("ATTR2")).as("attribute_2"),
      col("CATEGORY_CD").as("category_cd"),
      col("SOURCE_CD").as("source_cd"))
  }

  private lazy val registry = {
    val (meta, staged) = ChromRegion.readAcghPlatform(spark,
      s"$fixtureDir/TST_ACGH_region_platform.txt", "TST_ACGH")
    assert(meta("PLATFORM_TITLE") == "TST_ASGH") // the fixture's own typo
    ChromRegion.load(spark, staged, emptyRegions, emptyGplInfo, emptyBioMarkers,
      platformTitle = meta.getOrElse("PLATFORM_TITLE", ""))
  }

  test("chrom-region registry load replays the fixture platform") {
    val regions = registry.regions
    assert(regions.count() == 3422) // platform file data rows
    // organism falls back to the row column; ids are 1..N dense
    val r = regions.filter(col("region_name") === "chr1:554268-639640")
      .collect()(0)
    assert(r.getAs[String]("chromosome") == "1")
    assert(r.getAs[Int]("start_bp") == 554268)
    assert(r.getAs[Int]("num_probes") == 3)
    assert(r.getAs[String]("cytoband") == "1p36.33")
    assert(r.getAs[String]("organism") == "Homo Sapiens")
    assert(regions.agg(min("region_id"), max("region_id")).collect()(0)
      .toSeq == Seq(1L, 3422L))
    val gpl = registry.gplInfo.collect()(0)
    assert(gpl.getAs[String]("platform") == "TST_ACGH")
    assert(gpl.getAs[String]("marker_type") == "Chromosomal")
  }

  test("gene_id/gene_symbol backfills from the GENE marker registry") {
    val staged = Seq(
      ("GPL_X", "r1", "1", 1, 10, 1, "c", "BRCA1", null.asInstanceOf[java.lang.Long], "Homo Sapiens"),
      ("GPL_X", "r2", "1", 11, 20, 1, "c", null, java.lang.Long.valueOf(77L), "Homo Sapiens"),
      ("GPL_X", "r3", "1", 21, 30, 1, "c", null, null.asInstanceOf[java.lang.Long], "Homo Sapiens"))
      .toDF("gpl_id", "region_name", "chromosome", "start_bp", "end_bp",
        "num_probes", "cytoband", "gene_symbol", "gene_id", "organism")
    val markers = Seq(
      ("BRCA1", "HOMO SAPIENS", "672", "GENE"),
      ("BRCA1", "HOMO SAPIENS", "900", "GENE"), // min wins
      ("TP53", "Homo Sapiens", "77", "GENE"),
      ("TP53", "Homo Sapiens", "77", "PROTEIN"))
      .toDF("bio_marker_name", "organism", "primary_external_id", "bio_marker_type")
    val out = ChromRegion.load(spark, staged, emptyRegions, emptyGplInfo, markers)
      .regions.collect().map(r => r.getAs[String]("region_name") ->
        (r.getAs[java.lang.Long]("gene_id"), r.getAs[String]("gene_symbol"))).toMap
    assert(out("r1") == (672L, "BRCA1"))
    assert(out("r2") == (77L, "TP53"))
    assert(out("r3") == (null, null))
  }

  test("reload replaces the platform's regions, keeps other platforms") {
    val existing = Seq(
      (5L, "TST_ACGH", "stale", "S", 1L),
      (9L, "OTHER_GPL", "kept", "K", 2L))
      .toDF("region_id", "gpl_id", "region_name", "gene_symbol", "gene_id")
    val (_, staged) = ChromRegion.readAcghPlatform(spark,
      s"$fixtureDir/TST_ACGH_region_platform.txt", "TST_ACGH")
    val out = ChromRegion.load(spark, staged, existing, emptyGplInfo, emptyBioMarkers)
    assert(out.regions.filter(col("region_name") === "stale").count() == 0)
    assert(out.regions.filter(col("gpl_id") === "OTHER_GPL").count() == 1)
    // fresh ids start above the surviving max
    assert(out.regions.filter(col("gpl_id") === "TST_ACGH")
      .agg(min("region_id")).collect()(0).getLong(0) == 10L)
  }

  test("aCGH end-to-end replays testItLoadsData") {
    val melted = AcghMelt.melt(
      TsvReader.read(spark, s"$fixtureDir/TSTA_acgh_data.txt"), "region_id")
      .withColumnRenamed("region_id", "region_name")
      .withColumnRenamed("sample_id", "expr_id")

    assert(AcghPipeline.validate(sampleMap, registry.regions, registry.gplInfo).isEmpty)

    val patients = AcghPipeline.ensurePatients(
      spark, emptyPatients, sampleMap, "TSTA")
    assert(patients.count() == 2)
    assert(strings(patients, "sourcesystem_cd").sorted ==
      Seq("TSTA:TSGA-04-1530", "TSTA:TSGA-24-0980"))

    val t = AcghPipeline.run(spark, "TSTA",
      "\\Test Studies\\Test Study ACGH\\", sampleMap, melted,
      registry.regions, registry.gplInfo, patients)

    // hasSample(studyId, 'TSGA-04-1530', platform: 'ACGH')
    val samp = t.sampleMapping
      .filter(col("subject_id") === "TSGA-04-1530").collect()
    assert(samp.length == 1)
    assert(samp(0).getAs[String]("platform") == "ACGH")
    assert(samp(0).getAs[String]("gpl_id") == "TST_ACGH")
    assert(samp(0).getAs[String]("trial_name") == "TSTA")

    // hasRecord(de_subject_acgh_data, {trial_name, chip: 0.097},
    //           {segmented: 0.097, flag: 0})
    val rec = t.regionFacts
      .filter(col("trial_name") === "TSTA" && col("chip") === 0.097)
      .collect()
    assert(rec.nonEmpty)
    assert(rec.forall(r => r.getAs[Double]("segmented") == 0.097 &&
      r.getAs[Int]("flag") == 0))

    // every melted (region, sample) that resolves a region lands once
    assert(t.regionFacts.count() ==
      t.regionFacts.select("region_id", "assay_id").distinct().count())
    // both samples produce facts
    assert(t.regionFacts.select("assay_id").distinct().count() == 2)
    // leaf node substitutes the platform TITLE and tissue type
    val leaf = t.loadSamples.nodes.filter(col("node_type") === "LEAF")
      .select("leaf_node").collect()(0).getString(0)
    assert(leaf ==
      "\\Test Studies\\Test Study ACGH\\Biomarker Data\\Chrom\\TST ASGH\\Ovary\\")
  }

  test("addPlatform replaces the platform's de_gpl_info row (I2B2_ADD_PLATFORM)") {
    val existing = Seq(("GPL9", "old title", "Homo Sapiens", "Chromosomal", null: String, null: String))
      .toDF("platform", "title", "organism", "marker_type", "genome_build", "release_nbr")
    val out = ChromRegion.addPlatform(existing, "GPL9", "new title",
      "Mus musculus", "Gene Expression", genomeBuild = "mm10")
    assert(out.count() == 1)
    val r = out.collect()(0)
    assert(r.getAs[String]("title") == "new title")
    assert(r.getAs[String]("marker_type") == "Gene Expression")
    assert(r.getAs[String]("genome_build") == "mm10")
    // a different platform appends
    assert(ChromRegion.addPlatform(existing, "GPL10", "t", "o", "SNP").count() == 2)
  }

  test("validate surfaces the proc's abort conditions") {
    val badMap = sampleMap.withColumn("tissue_type", lit(null).cast("string"))
    val errs = AcghPipeline.validate(badMap, registry.regions, registry.gplInfo)
    assert(errs.exists(_.contains("Tissue Type is missing")))
    val wrongPlatform = sampleMap.withColumn("platform", lit("NOPE"))
    val errs2 = AcghPipeline.validate(wrongPlatform, registry.regions, registry.gplInfo)
    assert(errs2.exists(_.contains("de_chromosomal_region")))
    assert(errs2.exists(_.contains("de_gpl_info")))
  }
}

package graft.pipeline

import graft.SparkSpec
import graft.sources.{OmicsSources, TsvReader}
import graft.functions.CleansingFunctions
import org.apache.spark.sql.functions._

/** Replay of the reference's expression fixture
  * (Test Study_GSE0/ExpressionDataToUpload) through the composed omics
  * flow, asserting what ExpressionDataProcessorTest.groovy:55-74 asserts:
  * the platform-titled sample node counts 32 patients, the per-sample
  * attribute columns land (Attr1Value/Attr2Value/null combinations), and
  * raw intensities survive to the data table exactly. */
class ExpressionFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val dir =
    "/root/reference/fixtures/Test Studies/Test Study_GSE0/ExpressionDataToUpload"

  test("expression fixture: platform meta, samples, nodes, intensities") {
    val (meta, platformAnn) = OmicsSources.readPlatform(spark, s"$dir/GEX_TST.txt")
    assert(meta("PLATFORM_ID") == "GEX_TST")
    assert(meta("PLATFORM_TITLE") == "Test GEX Platform")
    // fuzzy columns found; multi-value ENTREZ ids are null, plain ids parse
    val pax8 = platformAnn.filter($"probeset_id" === "121_at").collect()(0)
    assert(pax8.getAs[String]("gene_symbol") == "PAX8")
    assert(pax8.getAs[Long]("gene_id") == 7849L)

    val sm = TsvReader.read(spark,
      s"$dir/Test Study_GSE0_Subject_Sample_Mapping_File.txt")
    // staging semantics: present-but-empty cells land as NULL (the
    // reference's staging loader nullifies empties)
    def nz(c: org.apache.spark.sql.Column) =
      when(length(coalesce(c, lit(""))) > 0, c)
    val sampleMap = sm.select(
      col("STUDY_ID").as("study_id"), nz(col("SITE_ID")).as("site_id"),
      col("SUBJECT_ID").as("subject_id"), col("SAMPLE_ID").as("sample_cd"),
      nz(col("PLATFORM")).as("platform"), nz(col("TISSUETYPE")).as("tissue_type"),
      nz(col("ATTR1")).as("attribute_1"), nz(col("ATTR2")).as("attribute_2"),
      nz(col("CATEGORY_CD")).as("category_cd"))
    val gplInfo = Seq((meta("PLATFORM_ID"), meta("PLATFORM_TITLE"), "Gene Expression"))
      .toDF("platform", "title", "marker_type")
    val patients = graft.core.Ids.denseIds(
      sampleMap.select(CleansingFunctions.usubjid(lit("GSE0"),
        coalesce(col("site_id"), lit("")), col("subject_id"))
        .as("sourcesystem_cd")).distinct(),
      Seq("sourcesystem_cd"), "patient_num")

    val ls = LoadSamples.run(spark, "GSE0", "\\Test Studies\\Test Study\\",
      sampleMap, gplInfo, patients)

    // the ontology node carries the platform TITLE; the patient count is
    // the TREE rollup (the attr-variant samples live on child leaves under
    // \Blood\, hasNode(...).withPatientCount counts the whole subtree)
    val bloodLeaf = "\\Test Studies\\Test Study\\Biomarker Data\\Test GEX Platform\\Blood\\"
    assert(ls.nodes.filter($"node_type" === "LEAF" && $"leaf_node" === bloodLeaf)
      .count() == 1)
    val factPaths = ls.sampleMapping.join(
      ls.nodes.filter($"node_type" === "LEAF")
        .select($"concept_cd".as("concept_code"), $"leaf_node"),
      Seq("concept_code"))
    val counts = graft.operators.TreeOps
      .conceptCounts(factPaths, "leaf_node", "patient_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(bloodLeaf) == 32)

    // per-sample attribute columns (hasRecord assertions)
    def rec(sample: String) = ls.sampleMapping
      .filter($"sample_cd" === sample).collect()(0)
    val r808 = rec("TST1000000808")
    assert(r808.getAs[String]("sample_type") == "Attr1Value")
    assert(r808.getAs[String]("timepoint") == "Attr2Value")
    assert(r808.getAs[String]("tissue_type") == "Blood")
    val r809 = rec("TST1000000809")
    assert(r809.getAs[String]("sample_type") == "Attr1Value")
    assert(r809.isNullAt(r809.fieldIndex("timepoint")))
    val r810 = rec("TST1000000810")
    assert(r810.isNullAt(r810.fieldIndex("sample_type")))
    assert(r810.getAs[String]("timepoint") == "Attr2Value")

    // intensities: matrix melt -> probe data, raw value preserved
    val matrix = TsvReader.readFast(spark,
      s"$dir/Test Study_GSE0_Gene_Expression_Data_R.txt")
    val omics = OmicsPipeline.run(spark, "GSE0", "\\Test Studies\\Test Study",
      sampleMap
        .withColumn("sample_id", $"sample_cd")
        .withColumn("platform_name", $"platform")
        .withColumn("tissuetype", $"tissue_type")
        .withColumn("attr1", $"attribute_1")
        .withColumn("attr2", $"attribute_2"),
      OmicsSources.meltMatrix(matrix),
      platformAnn.select($"probeset_id", $"gene_symbol", $"gene_id"))
    val assay719 = omics.sampleMapping.filter($"sample_id" === "TST1000000719")
      .select("assay_id").collect()(0).getLong(0)
    val v = omics.data
      .filter($"probeset_id" === "1007_s_at" && $"assay_id" === assay719)
      .collect()(0).getAs[Double]("raw_intensity")
    assert(math.abs(v - 6.624529839) < 0.001)
  }
}

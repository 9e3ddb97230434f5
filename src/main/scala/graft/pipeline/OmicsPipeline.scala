package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PathFunctions._
import graft.operators.ZScore

/** The omics (expression-family) load — the Spark rebuild of
  * I2B2_LOAD_SAMPLES + I2B2_PROCESS_MRNA_DATA (§3.2), shared by the six
  * datatype variants the reference implements as near-identical procedures
  * (mrna/rnaseq/protein/metabolomics/mirna/rbm).
  *
  * Inputs: the subject-sample mapping file (STUDY_ID SITE_ID SUBJECT_ID
  * SAMPLE_ID PLATFORM TISSUETYPE ATTR1 ATTR2 CATEGORY_CD), the melted
  * probe matrix, and the platform annotation registry.
  *
  * Flow: category-node synthesis with PLATFORM/TISSUETYPE/ATTR1/ATTR2
  * substitution (I2B2_LOAD_SAMPLES.sql:319-450) -> assay/sample dimension
  * with stable ids -> probe-level join + duplicate-probe averaging (A6/J2,
  * I2B2_PROCESS_MRNA_DATA.sql:136-161) -> z-score (ZScore.pipeline).
  *
  * Scale: sample mapping and annotations are dimensions (broadcast);
  * the melted matrix is the fact stream, shuffled once on the probe key
  * for averaging and reusing that partitioning for the stats join. The
  * reference's partition-per-dataset DDL becomes write-side
  * `partitionBy(trial, source)`.
  */
object OmicsPipeline {

  final case class OmicsTables(
      sampleMapping: DataFrame,
      sampleFacts: DataFrame,
      data: DataFrame)

  /** PLATFORM/TISSUETYPE/ATTR1/ATTR2 substitution into the category path
    * (+ -> \, _ -> space), reference I2B2_LOAD_SAMPLES.sql:365-450. */
  def sampleNodePath(topNode: String): org.apache.spark.sql.Column = {
    val cat = regexp_replace(regexp_replace(coalesce(col("category_cd"),
      lit("Biomarker Data+PLATFORM+TISSUETYPE")), "_", " "), "\\+", "\\\\")
    val sub = Seq("PLATFORM" -> "platform_name", "TISSUETYPE" -> "tissuetype",
      "ATTR1" -> "attr1", "ATTR2" -> "attr2")
      .foldLeft(cat) { case (c, (ph, colName)) =>
        replace(c, lit(ph), coalesce(col(colName), lit("")))
      }
    normalizePath(concat(lit(topNode + "\\"), sub))
  }

  def run(spark: SparkSession, studyId: String, topNode: String,
          sampleMap: DataFrame, meltedMatrix: DataFrame,
          platform: DataFrame, dataType: String = "R",
          logBase: Double = 2.0): OmicsTables = {

    // --- sample mapping dimension with synthesized leaf nodes + assay ids
    val mapping = graft.core.Ids.denseIds(
      sampleMap
        .withColumn("usubjid",
          graft.functions.CleansingFunctions.usubjid(
            col("study_id"), coalesce(col("site_id"), lit("")), col("subject_id")))
        .withColumn("leaf_node", sampleNodePath(topNode)),
      Seq("sample_id"), "assay_id")

    // --- per-sample category facts (one row per sample at its node)
    val sampleFacts = mapping.select(
      col("usubjid"), col("sample_id"), col("assay_id"),
      col("leaf_node"), lit(studyId).as("sourcesystem_cd"))

    // --- probe data: tag with assay, join annotations, average dup probes
    val tagged = meltedMatrix
      .join(broadcast(mapping.select(col("sample_id"), col("assay_id"), col("usubjid"))),
        meltedMatrix("sample_id") === mapping("sample_id"))
      .drop(mapping("sample_id"))
      .join(broadcast(platform.select(col("probeset_id"), col("gene_symbol"), col("gene_id"))),
        Seq("probeset_id"), "left")

    // The average is rounded to 6 dp before the log/median/stddev stage:
    // partial-aggregation sum order is nondeterministic across engines and
    // partitionings, and an ulp of drift here would otherwise flip rounding
    // boundaries after the log transform.
    val averaged = tagged
      .groupBy(col("probeset_id"), col("assay_id"))
      .agg(round(avg(col("intensity_value")), 6).as("intensity_value"),
        first(col("usubjid"), ignoreNulls = true).as("usubjid"),
        first(col("gene_symbol"), ignoreNulls = true).as("gene_symbol"),
        first(col("gene_id"), ignoreNulls = true).as("gene_id"))

    // --- z-score over the probe partitioning we already have
    val data = ZScore.pipeline(averaged, Seq("probeset_id"), "intensity_value",
      dataType = dataType, logBase = logBase)
      .withColumn("trial_name", lit(studyId))

    OmicsTables(mapping, sampleFacts, data)
  }

  final case class FullOmicsTables(
      annotation: AnnotationRegistry.AnnotationTables,
      loadSamples: LoadSamples.LoadSamplesTables,
      omics: OmicsTables)

  /** The complete §3.2 expression-upload flow, composed exactly like the
    * reference's procedure chain: platform annotation load
    * (i2b2_load_annotation_deapp) -> sample/node build (I2B2_LOAD_SAMPLES)
    * -> probe tagging via the refreshed registry -> duplicate-probe
    * averaging -> z-score (I2B2_PROCESS_MRNA_DATA). The probe join uses
    * the annotation output the same way the reference's
    * `md.probeset = gs.probeset and sd.gpl_id = gs.platform` join does. */
  def runFull(spark: SparkSession, studyId: String, topNode: String,
              sampleMap: DataFrame, meltedMatrix: DataFrame,
              stagedAnnotations: DataFrame, probesets: DataFrame,
              bioMarkers: DataFrame, gplInfo: DataFrame, patients: DataFrame,
              dataType: String = "R", logBase: Double = 2.0,
              markerType: String = "GENE EXPRESSION"): FullOmicsTables = {
    val ann = AnnotationRegistry.load(spark, stagedAnnotations, probesets, bioMarkers)
    val ls = LoadSamples.run(spark, studyId, topNode, sampleMap, gplInfo,
      patients, markerType)
    val platform = ann.mrnaAnnotation.select(
      col("probe_id").as("probeset_id"), col("gene_symbol"), col("gene_id"))
      .distinct()
    val omics = run(spark, studyId, topNode, sampleMap, meltedMatrix,
      platform, dataType, logBase)
    FullOmicsTables(ann, ls, omics)
  }
}

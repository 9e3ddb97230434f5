package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** aCGH end-to-end — the Spark rebuild of `i2b2_process_acgh_data`
  * (reference sql/postgres/procedures/I2B2_PROCESS_ACGH_DATA.sql:1-1133).
  *
  * The proc is the mRNA load with three deltas: the node machinery runs
  * against `marker_type = 'Chromosomal'` platforms (:330-338), the sample
  * mapping lands with the literal platform 'ACGH' (:588), and the fact
  * build resolves regions against de_chromosomal_region instead of a
  * probeset registry — sample map x melted 7-metric data x region
  * registry, GROUP BY-deduplicated, into the partitioned
  * de_subject_acgh_data (:938-1010).
  *
  * Node synthesis, the sample-mapping join chain, and per-sample 'T'/'E'
  * category facts are [[LoadSamples.run]] with `markerType =
  * "CHROMOSOMAL"` — the reference reuses its wt_mrna_* machinery
  * verbatim, so we reuse ours.
  *
  * Scale: the sample map, node frames and region registry are dimensions
  * (broadcast); the melted matrix is the only fact-scale frame and it is
  * touched once — two broadcast joins and one distinct on its own key
  * grain, no fact-side shuffle beyond the dedup.
  */
object AcghPipeline {

  final case class AcghTables(
      loadSamples: LoadSamples.LoadSamplesTables,
      sampleMapping: DataFrame,
      sampleFacts: DataFrame,
      regionFacts: DataFrame)

  /** The proc's abort checks (:95-160), returned as the reference's
    * messages instead of audit-table writes. */
  def validate(sampleMap: DataFrame, regions: DataFrame,
               gplInfo: DataFrame): Seq[String] = {
    val m = sampleMap.agg(
      sum(when(col("subject_id").isNull, 1L).otherwise(0L)).as("no_subj"),
      sum(when(col("sample_cd").isNull, 1L).otherwise(0L)).as("no_samp"),
      sum(when(col("platform").isNull, 1L).otherwise(0L)).as("no_plat"),
      sum(when(col("tissue_type").isNull, 1L).otherwise(0L)).as("no_tissue"))
      .collect()(0)
    val platforms = sampleMap.select(col("platform")).distinct()
    val noRegion = platforms.join(
      regions.select(col("gpl_id").as("platform")).distinct(),
      Seq("platform"), "left_anti").limit(1).count()
    val noGpl = platforms.join(
      gplInfo.filter(col("marker_type") === "Chromosomal" && col("title").isNotNull)
        .select(col("platform")).distinct(),
      Seq("platform"), "left_anti").limit(1).count()
    val multiPlatform = sampleMap.groupBy(col("sample_cd"))
      .agg(countDistinct(col("platform")).as("n"))
      .filter(col("n") > 1).limit(1).count()
    Seq(
      (m.getLong(0) > 0) -> "Subject ID is missing from one or more records in lt_src_mrna_subj_samp_map",
      (m.getLong(1) > 0) -> "Sample ID is missing from one or more records in lt_src_mrna_subj_samp_map",
      (m.getLong(2) > 0) -> "Platform is missing from one or more records in lt_src_mrna_subj_samp_map",
      (noRegion > 0) -> "Platform not found in deapp.de_chromosomal_region",
      (noGpl > 0) -> "Platform not found in deapp.de_gpl_info with marker_type of Chromosomal",
      (m.getLong(3) > 0) -> "Tissue Type is missing from one or more records in lt_src_mrna_subj_samp_map",
      (multiPlatform > 0) -> "Multiple platforms for sample_cd in lt_src_mrna_subj_samp_map")
      .collect { case (bad, msg) if bad => msg }
  }

  /** patient_dimension upsert for the trial's subjects (:168-205):
    * sourcesystem_cd = TRIAL:site:subject with '::' runs collapsed; new
    * subjects get max(existing)+dense-rank patient numbers, sex 'Unknown'.
    * Returns the TRIAL's patient slice — existing rows reused, new
    * subjects appended past the warehouse max — which is both what the
    * omics pipelines join against and exactly the trial partition a
    * partitioned warehouse rewrites. The usubjid's leading component IS
    * the trial, so the existing-row probe prefix-prunes the scan; only
    * the max(patient_num) aggregate touches other trials (column stats). */
  def ensurePatients(spark: SparkSession, patients: DataFrame,
                     sampleMap: DataFrame, trialId: String): DataFrame = {
    val slice = patients.filter(col("sourcesystem_cd").startsWith(trialId + ":"))
    val wanted = sampleMap
      .filter(col("subject_id").isNotNull)
      .select(graft.functions.CleansingFunctions.usubjid(
        lit(trialId), coalesce(col("site_id"), lit("")), col("subject_id"))
        .as("sourcesystem_cd"))
      .distinct()
    val fresh = wanted.join(
      slice.select(col("sourcesystem_cd")), Seq("sourcesystem_cd"), "left_anti")
    slice.unionByName(
      graft.core.Ids.denseIdsAfter(fresh, Seq("sourcesystem_cd"), "patient_num",
          patients.agg(coalesce(max(col("patient_num")), lit(0L))))
        .withColumn("sex_cd", lit("Unknown")),
      allowMissingColumns = true)
  }

  /** @param sampleMap  lt_src_mrna_subj_samp_map: (site_id, subject_id,
    *                   sample_cd, platform, tissue_type, attribute_1,
    *                   attribute_2, category_cd)
    * @param melted     lt_src_acgh_data, already melted to one row per
    *                   (region_name, expr_id) with the 7 string metrics
    *                   ([[graft.sources.AcghMelt.melt]] renamed)
    * @param regions    de_chromosomal_region: (region_id: long, gpl_id,
    *                   region_name)
    * @param patients   patient_dimension: (patient_num: long,
    *                   sourcesystem_cd) — pass through [[ensurePatients]]
    *                   first to mirror the proc's upsert */
  def run(spark: SparkSession, trialId: String, topNode: String,
          sampleMap: DataFrame, melted: DataFrame, regions: DataFrame,
          gplInfo: DataFrame, patients: DataFrame,
          sourceCd: String = "STD", partitionId: Long = 1L): AcghTables = {

    // node build + mapping join chain + per-sample category facts —
    // CHROMOSOMAL platforms only (:330-338)
    val ls = LoadSamples.run(spark, trialId, topNode, sampleMap, gplInfo,
      patients, markerType = "CHROMOSOMAL", platformNodeFromTitle = true)

    // de_subject_sample_mapping deltas (:588-650): literal platform
    // 'ACGH', source/partition bookkeeping, deterministic assay ids
    val mapping = graft.core.Ids.denseIds(
        ls.sampleMapping, Seq("sample_cd", "subject_id"), "assay_id")
      .withColumn("platform", lit("ACGH"))
      .withColumn("source_cd", lit(sourceCd))
      .withColumn("partition_id", lit(partitionId))
      .withColumn("omic_source_study", lit(trialId))
      .withColumn("omic_patient_id", col("patient_id"))

    // wt_subject_acgh_region -> de_subject_acgh_data (:938-1010):
    // sample map x data (sample_cd = expr_id) x region registry
    // (gpl_id + region_name), 7 metrics cast, GROUP BY-dedup
    val sd = broadcast(mapping.select(
      col("sample_cd"), col("gpl_id"), col("patient_id"), col("assay_id")))
    val gs = broadcast(regions.select(
      col("region_id"), col("gpl_id"), col("region_name")))
    val regionFacts = melted
      .join(sd, melted("expr_id") === sd("sample_cd"))
      .join(gs, Seq("gpl_id", "region_name"))
      .select(
        lit(partitionId).as("partition_id"),
        col("region_id"),
        col("assay_id"),
        col("patient_id"),
        lit(trialId).as("trial_name"),
        col("chip").try_cast("double").as("chip"),
        col("segmented").try_cast("double").as("segmented"),
        col("flag").try_cast("int").as("flag"),
        col("probloss").try_cast("double").as("probloss"),
        col("probnorm").try_cast("double").as("probnorm"),
        col("probgain").try_cast("double").as("probgain"),
        col("probamp").try_cast("double").as("probamp"))
      .distinct()

    AcghTables(ls, mapping, ls.sampleFacts, regionFacts)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.AnnotationRegistry

/** Deep-omics operators under the oracle gate: the platform-annotation
  * registry load (I2B2_LOAD_ANNOTATION_DEAPP) and the load-samples build
  * (I2B2_LOAD_SAMPLES). Inputs are synthesized deterministically from the
  * TPC-H tables so DuckDB can recompute the whole flow independently. */
object OmicsQueries {

  // Plain load for the dim-sized inputs (part/nation/supplier/region);
  // only the melted-matrix lineitem read keeps the parallelized path —
  // it fans every row out to 7 string-cast metric columns.
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tp(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadParallel(s, dir, name)

  /** Staged annotation file: parts play probes. Nulls are seeded into
    * gene_symbol (every 5th), gene_id (every 3rd) and organism (every 4th)
    * to exercise the default-organism and backfill paths. */
  private def stagedAnnotations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      lit("GPL1").as("gpl_id"),
      concat(lit("P"), col("p_partkey").cast("string")).as("probe_id"),
      when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("G"), (col("p_partkey") % 50).cast("string")))
        .as("gene_symbol"),
      when(col("p_partkey") % 3 === 0, lit(null).cast("string"))
        .otherwise((col("p_partkey") % 200).cast("string")).as("gene_id"),
      when(col("p_partkey") % 4 === 0, lit(null).cast("string"))
        .when(col("p_partkey") % 4 === 1, lit("Homo sapiens"))
        .otherwise(lit("Mus musculus")).as("organism"))

  /** Pre-existing probeset registry: the even parts, default organism. */
  private def existingProbesets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") % 2 === 0).select(
      col("p_partkey").cast("long").as("probeset_id"),
      concat(lit("P"), col("p_partkey").cast("string")).as("probeset"),
      lit("GPL1").as("platform"),
      lit("Homo sapiens").as("organism"))

  /** biomart.bio_marker gene registry: suppliers play markers; mixed-case
    * organism / type values exercise the upper() matching. */
  private def bioMarkers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(
      concat(lit("G"), (col("s_suppkey") % 50).cast("string")).as("bio_marker_name"),
      when(col("s_suppkey") % 2 === 0, lit("HOMO SAPIENS"))
        .otherwise(lit("Mus musculus")).as("organism"),
      (col("s_suppkey") % 200).cast("string").as("primary_external_id"),
      when(col("s_suppkey") % 10 === 0, lit("PROTEIN"))
        .otherwise(lit("gene")).as("bio_marker_type"))

  /** The de_mrna_annotation table produced by the registry load. */
  def annotationRegistry(s: SparkSession, dir: String): DataFrame =
    AnnotationRegistry.load(s,
      stagedAnnotations(s, dir), existingProbesets(s, dir), bioMarkers(s, dir))
      .mrnaAnnotation

  // ---- I2B2_LOAD_SAMPLES inputs: suppliers play samples, regions play
  // ---- platforms. Two category shapes exercise the placeholder-prefix
  // ---- logic; nulls in attribute_1 and a marker-type mismatch (GPL2)
  // ---- exercise the guards and the title default.

  private def siteId = when(col("s_suppkey") % 3 === 0, lit(""))
    .otherwise(concat(lit("SITE"), (col("s_suppkey") % 3).cast("string")))

  private def sampleMapInput(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(
      siteId.as("site_id"),
      col("s_name").as("subject_id"),
      concat(lit("SMP"), col("s_suppkey").cast("string")).as("sample_cd"),
      concat(lit("GPL"), (col("s_suppkey") % 4).cast("string")).as("platform"),
      when(col("s_suppkey") % 2 === 0, lit("Liver")).otherwise(lit("Blood"))
        .as("tissue_type"),
      when(col("s_suppkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("FFPE_"), (col("s_suppkey") % 2).cast("string")))
        .as("attribute_1"),
      lit(null).cast("string").as("attribute_2"),
      when(col("s_suppkey") % 2 === 0,
        lit("Biomarker_Data+PLATFORM+TISSUETYPE+ATTR1"))
        .otherwise(lit("Biomarker_Data+TISSUETYPE+PLATFORM")).as("category_cd"))

  private def gplInfoInput(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").select(
      concat(lit("GPL"), col("r_regionkey").cast("string")).as("platform"),
      concat(lit("Chip "), col("r_name")).as("title"),
      when(col("r_regionkey") === 2, lit("SNP")).otherwise(lit("Gene Expression"))
        .as("marker_type"))

  private def patientsInput(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .filter(col("s_suppkey") % 17 =!= 0) // some samples have no patient row
      .select(col("s_suppkey").cast("long").as("patient_num"),
        graft.functions.CleansingFunctions.usubjid(
          lit("TPCH"), siteId, col("s_name")).as("sourcesystem_cd"))

  private def loadSamples(s: SparkSession, dir: String) =
    graft.pipeline.LoadSamples.run(s, "TPCH", "\\Studies\\TPCH\\",
      sampleMapInput(s, dir), gplInfoInput(s, dir), patientsInput(s, dir))

  /** The de_subject_sample_mapping build: 1-inner + 4-left node join chain. */
  def loadSamplesMapping(s: SparkSession, dir: String): DataFrame =
    loadSamples(s, dir).sampleMapping

  /** Per-sample category facts (observation_fact rows). */
  def loadSamplesFacts(s: SparkSession, dir: String): DataFrame =
    loadSamples(s, dir).sampleFacts

  /** Range join (variant-in-region): synthetic positions from orders
    * against synthetic regions from part, the same
    * deterministic-synthesis convention as [[chromStaged]]; binned
    * equi-join via [[graft.operators.RangeJoin.pointInInterval]] (no
    * per-key cartesian), aggregated per region. */
  def rangePointsRegions(s: SparkSession, dir: String): DataFrame = {
    val points = t(s, dir, "orders").select(
      ((col("o_orderkey") % 22) + 1).as("chrom"),
      ((col("o_custkey") * 37 + col("o_orderkey")) % 10000000L).as("pos"),
      col("o_orderkey").as("point_id"))
    val intervals = t(s, dir, "part").select(
      ((col("p_partkey") % 22) + 1).as("chrom"),
      ((col("p_partkey") % 9973) * 1000).as("lo"),
      ((col("p_partkey") % 9973) * 1000 + 500 + (col("p_partkey") % 5000))
        .as("hi"),
      concat(lit("R"), col("p_partkey").cast("string")).as("region_name"))
    // binWidth derived from the median interval span (~3 kb here) — the
    // round-10 auto-width path, exercised by the oracle gate
    graft.operators.RangeJoin
      .pointInInterval(points, intervals, Seq("chrom"), "pos", "lo", "hi")
      .groupBy(col("region_name"))
      .agg(count(lit(1)).as("n_points"),
        min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
  }

  /** Interval x interval overlap join (region-overlap): parts play
    * annotation regions, orders play query windows; each overlapping
    * pair counted exactly once via the ownership-bin rule. */
  def rangeIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val regions = t(s, dir, "part").select(
      ((col("p_partkey") % 22) + 1).as("chrom"),
      ((col("p_partkey") % 9973) * 1000).as("a_lo"),
      ((col("p_partkey") % 9973) * 1000 + 500 + (col("p_partkey") % 5000))
        .as("a_hi"),
      concat(lit("R"), col("p_partkey").cast("string")).as("region_name"))
    val windows = t(s, dir, "orders").select(
      ((col("o_orderkey") % 22) + 1).as("chrom"),
      ((col("o_custkey") * 37 + col("o_orderkey")) % 10000000L).as("b_lo"),
      (((col("o_custkey") * 37 + col("o_orderkey")) % 10000000L) + 200
        + (col("o_orderkey") % 3000)).as("b_hi"),
      col("o_orderkey").as("query_id"))
    graft.operators.RangeJoin
      .intervalOverlap(regions, windows, Seq("chrom"),
        "a_lo", "a_hi", "b_lo", "b_hi")
      .groupBy(col("region_name"))
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("b_lo")).as("min_qlo"), max(col("b_hi")).as("max_qhi"))
  }

  // ---- I2B2_LOAD_CHROM_REGION inputs: parts play staged regions (nulls
  // ---- seeded into gene_symbol/gene_id to exercise both backfills),
  // ---- nations play the pre-existing registry (even keys = the reloaded
  // ---- platform, to be replaced; odd keys = another platform, kept).

  private def chromStaged(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      lit("GPL_A").as("gpl_id"),
      concat(lit("R"), col("p_partkey").cast("string")).as("region_name"),
      ((col("p_partkey") % 22) + 1).cast("string").as("chromosome"),
      // % 1e6 bounds the synthetic base-pair domain. partkey <= SF*2e5,
      // so the modulo is a no-op only for SF <= 5; above that (and for
      // the sf1 probe's key-shifted partkeys, ~7e12 after the shift) it
      // wraps — deliberately, so start_bp can never overflow the INT
      // domain under ANSI mode at any SF. The oracle carries the same
      // modulo, so parity holds on both sides of the bound.
      ((col("p_partkey") % 1000000) * 1000).cast("int").as("start_bp"),
      ((col("p_partkey") % 1000000) * 1000 + 999).cast("int").as("end_bp"),
      col("p_size").cast("int").as("num_probes"),
      col("p_brand").as("cytoband"),
      when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("G"), (col("p_partkey") % 50).cast("string")))
        .as("gene_symbol"),
      when(col("p_partkey") % 3 === 0, lit(null).cast("long"))
        .otherwise((col("p_partkey") % 200).cast("long")).as("gene_id"),
      when(col("p_partkey") % 4 === 0, lit("HOMO SAPIENS"))
        .otherwise(lit("Homo Sapiens")).as("organism"))

  private def chromExisting(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
      (col("n_nationkey") + 1000).cast("long").as("region_id"),
      when(col("n_nationkey") % 2 === 0, lit("GPL_A")).otherwise(lit("GPL_B"))
        .as("gpl_id"),
      col("n_name").as("region_name"),
      lit(null).cast("string").as("chromosome"),
      lit(null).cast("int").as("start_bp"),
      lit(null).cast("int").as("end_bp"),
      lit(null).cast("int").as("num_probes"),
      lit(null).cast("string").as("cytoband"),
      lit(null).cast("string").as("gene_symbol"),
      lit(null).cast("long").as("gene_id"),
      lit("Homo Sapiens").as("organism"))

  /** The de_chromosomal_region registry after an i2b2_load_chrom_region
    * run: platform replace + both gene backfills + deterministic ids. */
  def chromRegion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gplInfo = Seq(("GPL_A", "stale title", "Homo Sapiens", "Chromosomal", ""))
      .toDF("platform", "title", "organism", "marker_type", "release_nbr")
    graft.pipeline.ChromRegion.load(s, chromStaged(s, dir),
      chromExisting(s, dir), gplInfo, bioMarkers(s, dir),
      platformTitle = "Chromosomal Chip A").regions
  }

  // ---- I2B2_PROCESS_ACGH_DATA: suppliers play samples, parts play
  // ---- regions, lineitem plays the melted 7-metric matrix.

  private def acghSampleMap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(
      lit("TPCH").as("study_id"),
      lit(null).cast("string").as("site_id"),
      col("s_name").as("subject_id"),
      col("s_name").as("sample_cd"),
      lit("GPL_A").as("platform"),
      lit("Ovary").as("tissue_type"),
      lit(null).cast("string").as("attribute_1"),
      lit(null).cast("string").as("attribute_2"),
      lit("Biomarker_Data+Chrom+PLATFORM+TISSUETYPE").as("category_cd"),
      lit("STD").as("source_cd"))

  private def acghMelted(s: SparkSession, dir: String): DataFrame =
    tp(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"),
        concat(lit("R"), col("p_partkey").cast("string")).as("region_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("region_name"), col("s_name").as("expr_id"),
        col("l_quantity").cast("string").as("chip"),
        col("l_discount").cast("string").as("segmented"),
        (col("l_linenumber") % 2).cast("string").as("flag"),
        col("l_tax").cast("string").as("probloss"),
        (col("l_quantity") + 1).cast("string").as("probnorm"),
        col("l_discount").cast("string").as("probgain"),
        col("l_tax").cast("string").as("probamp"))

  // ---- Per-datatype annotation registries (round 5): parts play staged
  // ---- annotation rows, nations play the pre-existing registries,
  // ---- suppliers play bio_marker. Nulls are seeded to exercise every
  // ---- backfill path.

  /** de_protein_annotation: replace-by-platform with trim + organism
    * default (I2B2_LOAD_PROTEOMICS_ANNOT). */
  def annotProteomics(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "part").select(
      lit("GPLP").as("gpl_id"),
      concat(lit("  PEP"), col("p_partkey").cast("string"), lit("  ")).as("peptide"),
      when(col("p_partkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("U"), (col("p_partkey") % 100).cast("string")))
        .as("uniprot_id"),
      when(col("p_partkey") % 4 === 0, lit(null).cast("string"))
        .otherwise(lit("Homo Sapiens")).as("organism"))
    val existing = t(s, dir, "nation").select(
      when(col("n_nationkey") % 2 === 0, lit("GPLP")).otherwise(lit("GPLQ"))
        .as("gpl_id"),
      concat(lit("OLD"), col("n_nationkey").cast("string")).as("peptide"),
      lit(null).cast("string").as("uniprot_id"),
      lit(null).cast("string").as("uniprot_name"),
      lit("Homo sapiens").as("organism"))
    graft.pipeline.DatatypeAnnotations.proteomics(staged, existing)
  }

  /** de_rna_annotation: transcript NOT-IN insert + symbol backfill
    * (I2B2_RNA_ANNOTATION). */
  def annotRna(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "part").select(
      concat(lit("T"), (col("p_partkey") % 1800).cast("string")).as("transcript_id"),
      lit("GPLR").as("gpl_id"),
      when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("G"), (col("p_partkey") % 50).cast("string")))
        .as("gene_symbol"),
      lit("Homo sapiens").as("organism"))
    val existing = t(s, dir, "nation").select(
      concat(lit("T"), col("n_nationkey").cast("string")).as("transcript_id"),
      lit("GPLOLD").as("gpl_id"),
      when(col("n_nationkey") % 2 === 1,
        concat(lit("G"), col("n_nationkey").cast("string"))).as("gene_symbol"),
      when(col("n_nationkey") % 3 =!= 0, col("n_nationkey") + 900)
        .cast("long").as("gene_id"),
      lit("Homo sapiens").as("organism"))
    graft.pipeline.DatatypeAnnotations.rna(staged, existing, bioMarkers(s, dir))
  }

  /** de_qpcr_mirna_annotation: probeset upsert + organism refresh +
    * lower(mirna_id) (I2B2_LOAD_MIRNA_ANNOT_DEAPP). */
  def annotMirna(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "part").select(
      concat(lit("MIR"), col("p_partkey").cast("string")).as("id_ref"),
      when(col("p_partkey") % 6 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("HSA-MIR-"), (col("p_partkey") % 300).cast("string")))
        .as("mirna_id"),
      when(col("p_partkey") % 4 === 0, lit(null).cast("string"))
        .otherwise(lit("Homo Sapiens")).as("organism"),
      lit("GPLM").as("gpl_id"))
    val probesets = t(s, dir, "nation").select(
      (col("n_nationkey") + 500).cast("long").as("probeset_id"),
      concat(lit("MIR"), (col("n_nationkey") * 10).cast("string")).as("probeset"),
      lit("Old organism").as("organism"),
      when(col("n_nationkey") % 2 === 0, lit("GPLM")).otherwise(lit("GPLZ"))
        .as("platform"))
    graft.pipeline.DatatypeAnnotations.mirna(s, staged, probesets).annotation
  }

  /** de_rbm_annotation: antigen upsert + RBM-typed marker backfills
    * (I2B2_LOAD_RBM_ANNOTATION). */
  def annotRbm(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "part").select(
      lit("GPLB").as("gpl_id"),
      concat(lit("ANT"), (col("p_partkey") % 400).cast("string")).as("antigen_name"),
      when(col("p_partkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("U"), (col("p_partkey") % 100).cast("string")))
        .as("uniprotid"),
      when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("G"), (col("p_partkey") % 50).cast("string")))
        .as("gene_symbol"),
      when(col("p_partkey") % 3 === 0, lit(null).cast("string"))
        .otherwise((col("p_partkey") % 200).cast("string")).as("gene_id"))
    val antigens = t(s, dir, "nation").select(
      (col("n_nationkey") + 300).cast("long").as("antigen_id"),
      concat(lit("ANT"), col("n_nationkey").cast("string")).as("antigen_name"),
      when(col("n_nationkey") % 2 === 0, lit("GPLB")).otherwise(lit("GPLQ"))
        .as("platform"))
    val markers = t(s, dir, "supplier").select(
      concat(lit("G"), (col("s_suppkey") % 50).cast("string")).as("bio_marker_name"),
      (col("s_suppkey") % 200).cast("string").as("primary_external_id"),
      when(col("s_suppkey") % 3 === 0, lit("rbm")).otherwise(lit("GENE"))
        .as("bio_marker_type"))
    graft.pipeline.DatatypeAnnotations.rbm(s, staged, antigens, markers).annotation
  }

  private def metabStaged(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") % 8 === 0).select(
      lit("GPLX").as("gpl_id"),
      concat(lit("BIO"), col("p_partkey").cast("string")).as("biochemical_name"),
      when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("HMDB"), (col("p_partkey") % 250).cast("string")))
        .as("hmdb_id"),
      concat(lit("Sup "), (col("p_partkey") % 5).cast("string")).as("super_pathway"),
      concat(lit("Sub"), (col("p_partkey") % 7).cast("string"),
        lit(";Sub"), (col("p_partkey") % 11).cast("string")).as("sub_pathway"))

  private def metabMarkers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
      concat(lit("BIO"), (col("n_nationkey") * 16).cast("string")).as("bio_marker_name"),
      concat(lit("EXT"), col("n_nationkey").cast("string")).as("primary_external_id"))

  /** de_metabolite_annotation: replace-by-platform with marker join
    * (I2B2_LOAD_METABOLOMICS_ANNOT). */
  def annotMetabolomics(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.DatatypeAnnotations.metabolomics(
      s, metabStaged(s, dir), metabMarkers(s, dir)).annotation

  /** de_metabolite_sub_pathways: the `;`-split + super-pathway join. */
  def annotMetabSubPathways(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.DatatypeAnnotations.metabolomics(
      s, metabStaged(s, dir), metabMarkers(s, dir)).subPathways

  /** The de_subject_acgh_data build E2E: chromosomal node machinery ->
    * sample mapping with deterministic assay ids -> region facts. */
  def acghFacts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gplInfo = Seq(("GPL_A", "Chip Alpha", "Homo Sapiens", "Chromosomal", ""))
      .toDF("platform", "title", "organism", "marker_type", "release_nbr")
    val regions = t(s, dir, "part").select(
      col("p_partkey").cast("long").as("region_id"),
      lit("GPL_A").as("gpl_id"),
      concat(lit("R"), col("p_partkey").cast("string")).as("region_name"))
    val patients = t(s, dir, "supplier").select(
      (col("s_suppkey") + 5000).cast("long").as("patient_num"),
      graft.functions.CleansingFunctions.usubjid(
        lit("TPCH"), lit(""), col("s_name")).as("sourcesystem_cd"))
    val out = graft.pipeline.AcghPipeline.run(s, "TPCH", "\\Studies\\TPCH\\",
      acghSampleMap(s, dir), acghMelted(s, dir), regions, gplInfo, patients)
    out.regionFacts.select(
      col("partition_id"), col("region_id"), col("assay_id"), col("patient_id"),
      col("trial_name"),
      (round(col("chip"), 4) + lit(0.0)).as("chip"),
      (round(col("segmented"), 4) + lit(0.0)).as("segmented"),
      col("flag"),
      (round(col("probloss"), 4) + lit(0.0)).as("probloss"),
      (round(col("probnorm"), 4) + lit(0.0)).as("probnorm"),
      (round(col("probgain"), 4) + lit(0.0)).as("probgain"),
      (round(col("probamp"), 4) + lit(0.0)).as("probamp"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The five per-datatype annotation-registry loads that sibling the deapp
  * mRNA registry ([[AnnotationRegistry]]) — one entry point per reference
  * procedure, sharing the replace-by-platform / NOT-EXISTS-upsert /
  * marker-backfill helpers:
  *
  *  - [[proteomics]] — I2B2_LOAD_PROTEOMICS_ANNOT.sql:36-57
  *  - [[rna]]        — I2B2_RNA_ANNOTATION.sql:30-62
  *  - [[mirna]]      — I2B2_LOAD_MIRNA_ANNOT_DEAPP.sql:29-110
  *  - [[rbm]]        — I2B2_LOAD_RBM_ANNOTATION.sql:31-130
  *  - [[metabolomics]] — I2B2_LOAD_METABOLOMICS_ANNOT.sql:33-115
  *
  * Sequence-drawn ids become max(existing)+dense-rank ([[graft.core.Ids
  * .denseIds]]) so runs and engines agree. Every frame here is
  * dimension-sized (one platform's annotations); joins broadcast.
  */
object DatatypeAnnotations {

  private val DefaultOrganism = "Homo sapiens"

  /** The staged platform id — each proc does `select distinct gpl_id into
    * gplId` and would fail on a multi-platform stage. */
  private def singleGpl(staged: DataFrame, gplCol: String = "gpl_id"): String = {
    val ids = staged.select(col(gplCol)).distinct().collect().map(_.getString(0))
    require(ids.length == 1,
      s"staged annotation must hold exactly one platform, got ${ids.length}")
    ids.head
  }

  /** DELETE WHERE key = platform, null-safe (null-keyed rows survive). */
  private def dropPlatform(df: DataFrame, keyCol: String, gplId: String): DataFrame =
    df.filter(!(col(keyCol) <=> lit(gplId)))

  /** Max-id aggregate passed to [[graft.core.Ids.denseIdsAfter]] — rides
    * inside denseIds' counts job, no separate driver collect. */
  private def maxIdAgg(df: DataFrame, idCol: String): DataFrame =
    df.agg(coalesce(max(col(idCol)), lit(0L)))

  // -------------------------------------------------------------- proteomics

  /** de_protein_annotation (I2B2_LOAD_PROTEOMICS_ANNOT.sql:36-57): replace
    * the platform's rows with DISTINCT (gpl_id, trim(peptide), uniprot_id,
    * uniprot_name = uniprot_id, organism coalesced).
    *
    * @param staged   lt_protein_annotation: (gpl_id, peptide, uniprot_id,
    *                 organism)
    * @param existing de_protein_annotation */
  def proteomics(staged: DataFrame, existing: DataFrame): DataFrame = {
    val gplId = singleGpl(staged)
    dropPlatform(existing, "gpl_id", gplId).unionByName(
      staged.filter(col("gpl_id") === gplId)
        .select(col("gpl_id"), trim(col("peptide")).as("peptide"),
          col("uniprot_id"), col("uniprot_id").as("uniprot_name"),
          coalesce(col("organism"), lit(DefaultOrganism)).as("organism"))
        .distinct(),
      allowMissingColumns = true)
  }

  // --------------------------------------------------------------------- rna

  /** de_rna_annotation (I2B2_RNA_ANNOTATION.sql:30-62): insert DISTINCT
    * staged transcripts whose transcript_id is not already registered (the
    * reference's NOT IN is on transcript_id ALONE, not (transcript,
    * platform)); inserted gene_id is NULL; then backfill every null
    * gene_id (old and new) from bio_marker by symbol. The reference's
    * correlated `limit 1` picks an arbitrary marker — we take
    * min(primary_external_id) for determinism (documented deviation).
    *
    * @param staged   lt_rna_annotation: (transcript_id, gpl_id,
    *                 gene_symbol, organism)
    * @param existing de_rna_annotation incl. gene_id: long
    * @param bioMarkers biomart.bio_marker */
  def rna(staged: DataFrame, existing: DataFrame,
          bioMarkers: DataFrame): DataFrame = {
    val fresh = staged
      .select(col("transcript_id"), col("gpl_id"), col("gene_symbol"),
        lit(null).cast("long").as("gene_id"), col("organism"))
      .distinct()
      .join(existing.select(col("transcript_id")).distinct(),
        Seq("transcript_id"), "left_anti")
    val all = existing
      .select(col("transcript_id"), col("gpl_id"), col("gene_symbol"),
        col("gene_id"), col("organism"))
      .unionByName(fresh)
    val idBySymbol = bioMarkers
      .groupBy(col("bio_marker_name").as("bm_symbol"))
      .agg(min(col("primary_external_id").try_cast("long")).as("bm_gene_id"))
    all
      .join(broadcast(idBySymbol),
        all("gene_id").isNull && all("gene_symbol") === col("bm_symbol"), "left")
      .withColumn("gene_id", coalesce(col("gene_id"), col("bm_gene_id")))
      .drop("bm_symbol", "bm_gene_id")
  }

  // ------------------------------------------------------------------- mirna

  final case class MirnaTables(probesets: DataFrame, annotation: DataFrame)

  /** miRNA registry (I2B2_LOAD_MIRNA_ANNOT_DEAPP.sql:29-110):
    * mirna_probeset_deapp upsert — NOT EXISTS on (probeset, platform),
    * organism coalesced on insert and REFRESHED for every probeset the
    * stage mentions (the reference's correlated UPDATE takes `select
    * distinct t.organism` keyed on probeset alone; min() for determinism)
    * — then de_qpcr_mirna_annotation rebuilt for the staged rows: DISTINCT
    * (id_ref, lower(mirna_id), probeset_id, organism, gpl_id) joined on
    * (probeset, platform, organism-coalesced).
    *
    * @param staged    lt_qpcr_mirna_annotation: (id_ref, mirna_id,
    *                  organism, gpl_id)
    * @param probesets mirna_probeset_deapp: (probeset_id: long, probeset,
    *                  organism, platform) */
  def mirna(spark: SparkSession, staged: DataFrame,
            probesets: DataFrame): MirnaTables = {
    // organism refresh (:54-62): the reference GUARDS on (platform,
    // probeset) ∈ staged but takes the VALUE keyed on probeset alone
    // (`select distinct t.organism where p.probeset = t.id_ref`; min()
    // instead of distinct for determinism — documented deviation)
    val stagedKeys = staged.select(col("id_ref"), col("gpl_id")).distinct()
    val stagedOrg = staged.groupBy(col("id_ref").as("id_ref2"))
      .agg(min(col("organism")).as("new_organism"))
    val refreshed = probesets
      .join(broadcast(stagedKeys),
        probesets("probeset") === stagedKeys("id_ref") &&
          probesets("platform") === stagedKeys("gpl_id"), "left")
      .join(broadcast(stagedOrg), probesets("probeset") === col("id_ref2"), "left")
      .select(col("probeset_id"), col("probeset"), col("platform"),
        when(col("id_ref").isNotNull, col("new_organism"))
          .otherwise(probesets("organism")).as("organism"))
    val fresh = staged
      .select(col("id_ref").as("probeset"),
        coalesce(col("organism"), lit(DefaultOrganism)).as("organism"),
        col("gpl_id").as("platform"))
      .distinct()
      .join(refreshed.select(col("probeset"), col("platform")),
        Seq("probeset", "platform"), "left_anti")
    val registry = refreshed.unionByName(
      graft.core.Ids.denseIdsAfter(fresh, Seq("platform", "probeset", "organism"),
          "probeset_id", maxIdAgg(refreshed, "probeset_id"))
        .select(col("probeset_id"), col("probeset"), col("platform"), col("organism")))

    val annotation = staged
      .join(broadcast(registry),
        staged("id_ref") === registry("probeset") &&
          staged("gpl_id") === registry("platform") &&
          coalesce(staged("organism"), lit(DefaultOrganism)) ===
            coalesce(registry("organism"), lit(DefaultOrganism)))
      .select(col("id_ref"),
        lit(null).cast("string").as("probe_id"),
        lit(null).cast("string").as("mirna_symbol"),
        lower(col("mirna_id")).as("mirna_id"),
        col("probeset_id"),
        coalesce(staged("organism"), lit(DefaultOrganism)).as("organism"),
        col("gpl_id"))
      .distinct()
    MirnaTables(registry, annotation)
  }

  // --------------------------------------------------------------------- rbm

  final case class RbmTables(antigens: DataFrame, annotation: DataFrame)

  /** RBM registry (I2B2_LOAD_RBM_ANNOTATION.sql:31-130): antigen_deapp
    * upsert — NOT EXISTS on (antigen_name, platform) — then
    * de_rbm_annotation replaced for the platform: DISTINCT (gpl_id,
    * id = antigen_id, antigen_name, uniprot_id, gene_symbol,
    * gene_id::numeric), with gene_id/gene_symbol backfilled from
    * bio_marker type 'RBM' (no organism match — the reference comments it
    * out).
    *
    * @param staged   lt_src_rbm_annotation: (gpl_id, antigen_name,
    *                 uniprotid, gene_symbol, gene_id: string)
    * @param antigens antigen_deapp: (antigen_id: long, antigen_name,
    *                 platform) */
  def rbm(spark: SparkSession, staged: DataFrame, antigens: DataFrame,
          bioMarkers: DataFrame): RbmTables = {
    val fresh = staged
      .select(col("antigen_name"), col("gpl_id").as("platform"))
      .distinct()
      .join(antigens.select(col("antigen_name"), col("platform")),
        Seq("antigen_name", "platform"), "left_anti")
    val registry = antigens
      .select(col("antigen_id"), col("antigen_name"), col("platform"))
      .unionByName(
        graft.core.Ids.denseIdsAfter(fresh, Seq("platform", "antigen_name"),
            "antigen_id", maxIdAgg(antigens, "antigen_id"))
          .select(col("antigen_id"), col("antigen_name"), col("platform")))

    val rows = staged
      .join(broadcast(registry),
        staged("antigen_name") === registry("antigen_name") &&
          staged("gpl_id") === registry("platform"))
      .select(col("gpl_id"), col("antigen_id").as("id"),
        staged("antigen_name"), col("uniprotid").as("uniprot_id"),
        col("gene_symbol"), col("gene_id").try_cast("long").as("gene_id"))
      .distinct()

    // backfills from 'RBM'-typed markers, organism deliberately unmatched
    val rbmMarkers = bioMarkers.filter(upper(col("bio_marker_type")) === "RBM")
    val idBySymbol = rbmMarkers
      .groupBy(col("bio_marker_name").as("bm_symbol"))
      // the reference takes min() of the VARCHAR id then casts (:103)
      .agg(min(col("primary_external_id")).try_cast("long").as("bm_gene_id"))
    val symbolById = rbmMarkers
      .groupBy(col("primary_external_id").as("bm_gene_id2"))
      .agg(min(col("bio_marker_name")).as("bm_symbol2"))
    val annotation = rows
      .join(broadcast(idBySymbol),
        rows("gene_id").isNull &&
          length(coalesce(rows("gene_symbol"), lit(""))) > 0 &&
          rows("gene_symbol") === col("bm_symbol"), "left")
      .withColumn("gene_id", coalesce(col("gene_id"), col("bm_gene_id")))
      .drop("bm_symbol", "bm_gene_id")
      .join(broadcast(symbolById),
        length(coalesce(col("gene_symbol"), lit(""))) === 0 &&
          col("gene_id").isNotNull &&
          col("gene_id").cast("string") === col("bm_gene_id2"), "left")
      .withColumn("gene_symbol",
        when(length(coalesce(col("gene_symbol"), lit(""))) === 0, col("bm_symbol2"))
          .otherwise(col("gene_symbol")))
      .drop("bm_gene_id2", "bm_symbol2")
    RbmTables(registry, annotation)
  }

  // ------------------------------------------------------------ metabolomics

  /** Lazy fields (not a case class): [[graft.core.Ids.denseIds]] runs an
    * eager counts collect per table, so an eagerly-built result would pay
    * every table's id-assignment jobs even when the caller consumes ONE of
    * the four (annot_metabolomics reads only `annotation`,
    * annot_metab_sub_pathways only `subPathways` — guide §1.2: don't
    * compute things you throw away). Each table is built on first access;
    * dependencies (sub needs super, subPathwayMetab needs both) resolve
    * through the lazy vals. */
  final class MetabolomicsTables(
      annotationF: => DataFrame, superPathwaysF: => DataFrame,
      subPathwaysF: => DataFrame, subPathwayMetabF: => DataFrame) {
    lazy val annotation: DataFrame = annotationF
    lazy val superPathways: DataFrame = superPathwaysF
    lazy val subPathways: DataFrame = subPathwaysF
    lazy val subPathwayMetab: DataFrame = subPathwayMetabF
  }

  /** Metabolomics registry (I2B2_LOAD_METABOLOMICS_ANNOT.sql:33-115):
    * replace the platform's de_metabolite_annotation (staged LEFT JOIN
    * bio_marker by biochemical_name -> biomarker_id), the DISTINCT
    * super-pathways, the `;`-split sub-pathways joined to their super, and
    * the metabolite-to-sub-pathway mapping. Sequence ids are deterministic
    * dense ranks; rows identical up to id keep a stable multiset.
    *
    * @param staged lt_metabolomic_annotation: (gpl_id, biochemical_name,
    *               hmdb_id, super_pathway, sub_pathway) */
  def metabolomics(spark: SparkSession, staged: DataFrame,
                   bioMarkers: DataFrame): MetabolomicsTables = {
    val gplId = singleGpl(staged)
    val markersByName = bioMarkers
      .select(col("bio_marker_name"), col("primary_external_id"))
    lazy val annotation = graft.core.Ids.denseIds(
      staged
        .join(broadcast(markersByName),
          staged("biochemical_name") === col("bio_marker_name"), "left")
        .select(col("gpl_id"), trim(col("biochemical_name")).as("biochemical_name"),
          col("primary_external_id").as("biomarker_id"), col("hmdb_id")),
      Seq("biochemical_name", "hmdb_id"), "id")

    lazy val superPathways = graft.core.Ids.denseIds(
      staged.select(col("gpl_id"), col("super_pathway")).distinct(),
      Seq("super_pathway"), "id")
      .select(col("id"), col("gpl_id"), col("super_pathway").as("super_pathway_name"))

    // unnest(regexp_split_to_array(sub_pathway, ';')) — one row per
    // element per staged row, NO distinct (:86-99), joined to its super
    lazy val exploded = staged
      .select(col("gpl_id"), col("super_pathway"), col("biochemical_name"),
        explode(org.apache.spark.sql.functions.split(col("sub_pathway"), ";"))
          .as("sub_pathway"))
    lazy val subPathways = graft.core.Ids.denseIds(
      exploded
        .join(broadcast(superPathways.select(col("id").as("super_pathway_id"),
          col("super_pathway_name"))),
          trim(col("super_pathway")) === trim(col("super_pathway_name")))
        .select(col("gpl_id"), trim(col("sub_pathway")).as("sub_pathway_name"),
          col("super_pathway_id")),
      Seq("sub_pathway_name", "super_pathway_id"), "id")

    lazy val subPathwayMetab = exploded
      .select(trim(col("biochemical_name")).as("b"), trim(col("sub_pathway")).as("sp"))
      .join(broadcast(annotation.select(col("id").as("metabolite_id"),
        col("biochemical_name"))), col("b") === col("biochemical_name"))
      .join(broadcast(subPathways.select(col("id").as("sub_pathway_id"),
        col("sub_pathway_name"))), col("sp") === col("sub_pathway_name"))
      .select(col("metabolite_id"), col("sub_pathway_id"))
    new MetabolomicsTables(annotation, superPathways, subPathways, subPathwayMetab)
  }
}

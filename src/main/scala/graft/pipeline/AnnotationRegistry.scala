package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Platform-annotation registry load — the Spark rebuild of
  * `i2b2_load_annotation_deapp` (reference
  * sql/postgres/procedures/I2B2_LOAD_ANNOTATION_DEAPP.sql:60-290). Every
  * expression upload passes through this before facts load: the staged
  * annotation file (lt_src_deapp_annot) is folded into the probeset
  * registry (probeset_deapp) and the gene annotation table
  * (de_mrna_annotation), with gene ids/symbols backfilled from the
  * biomart.bio_marker gene registry.
  *
  * Functional rewrite of the reference's DML sequence:
  *  1. organism refresh for existing (platform, probeset) rows
  *     (reference :107-131)
  *  2. insert new probesets, NOT EXISTS on (platform, probeset,
  *     organism-coalesced), organism default 'Homo sapiens' (:135-162);
  *     new probeset_ids are assigned deterministically (max existing id +
  *     dense rank over (platform, probeset, organism) — the reference uses
  *     a sequence, which is not reproducible)
  *  3. de_mrna_annotation = staged DISTINCT joined to the registry on
  *     (probe, platform, organism-coalesced); gene_id cast to numeric
  *     (:166-232)
  *  4. gene_id backfill where null: biomart GENE markers grouped by
  *     (symbol, organism), min(primary_external_id) (:239-255)
  *  5. gene_symbol backfill where null: GENE markers grouped by
  *     (gene_id, organism), min(symbol) (:272-289). NOTE the reference's
  *     EXISTS guard compares `a.gene_symbol = x.bio_marker_name` on rows
  *     where a.gene_symbol IS NULL, so the reference statement can never
  *     update a row — an evident reference bug; we implement the intended
  *     semantics and cite the deviation here.
  *
  * Scale: the registry and bio_marker are dimensions (broadcast); staged
  * annotations for one platform are bounded (~10^6 probes), so every join
  * here broadcasts — no large shuffle anywhere.
  */
object AnnotationRegistry {

  final case class AnnotationTables(probesets: DataFrame, mrnaAnnotation: DataFrame)

  private val DefaultOrganism = "Homo sapiens"

  /** @param staged    lt_src_deapp_annot: (gpl_id, probe_id, gene_symbol,
    *                   gene_id: string, organism)
    * @param probesets probeset_deapp: (probeset_id: long, probeset,
    *                   platform, organism)
    * @param bioMarkers biomart.bio_marker: (bio_marker_name, organism,
    *                   primary_external_id: string, bio_marker_type) */
  def load(spark: SparkSession, staged: DataFrame, probesets: DataFrame,
           bioMarkers: DataFrame): AnnotationTables = {

    val stagedDistinct = staged
      .select(col("gpl_id"), col("probe_id"), col("gene_symbol"),
        col("gene_id"), col("organism"))
      .distinct()
    // NOT checkpointed (measured r16): stagedDistinct has three consumers
    // like `refreshed` below, but a lazy localCheckpoint here measured
    // 1.44-4.70 s across 4 interleaved A/B rounds vs a stable 1.81-2.10 s
    // without — the extra materialization stage destabilizes the chain of
    // KB-sized 1-task stages for no median win. The re-derivation is a
    // distinct over one platform's staged file; recompute is the floor.

    // 1. organism refresh for existing registry rows (reference :107-131).
    //    ONE organism per (platform, probe): the reference's UPDATE writes a
    //    single row, and any additional staged organism reaches the registry
    //    through step 2's NOT-EXISTS insert with a fresh probeset_id — a
    //    distinct-per-organism here would instead fan the existing
    //    probeset_id out across organisms. min() makes the kept organism
    //    deterministic (the reference's join order is not).
    val stagedOrg = stagedDistinct
      .groupBy(col("gpl_id"), col("probe_id"))
      .agg(min(col("organism")).as("new_organism"))
    val refreshed = probesets
      .join(broadcast(stagedOrg),
        probesets("platform") === stagedOrg("gpl_id") &&
          probesets("probeset") === stagedOrg("probe_id"), "left")
      .select(col("probeset_id"), col("probeset"), col("platform"),
        when(col("gpl_id").isNotNull, col("new_organism"))
          .otherwise(probesets("organism")).as("organism"))
      // THREE consumers (the NOT-EXISTS anti-join, the max-id aggregate,
      // the registry union) would each re-run the staged distinct + join;
      // registry-dimension-sized, so materialize once (lazy — the
      // denseIdsAfter counts collect is the first action). r15: 18 jobs
      // -> 12 on the annotation_registry gate.
      .localCheckpoint(false)

    // 2. new probesets: NOT EXISTS on (platform, probeset, organism)
    //    with organism coalesced to the default on BOTH sides (:135-162)
    val candidate = stagedDistinct.select(
      col("probe_id").as("probeset"),
      coalesce(col("organism"), lit(DefaultOrganism)).as("organism"),
      col("gpl_id").as("platform")).distinct()
    val fresh = candidate.join(
      refreshed.select(col("platform"), col("probeset"),
        coalesce(col("organism"), lit(DefaultOrganism)).as("organism")),
      Seq("platform", "probeset", "organism"), "left_anti")
    val freshWithIds = graft.core.Ids.denseIdsAfter(
      fresh, Seq("platform", "probeset", "organism"), "probeset_id",
      refreshed.agg(coalesce(max(col("probeset_id")), lit(0L))))
      .select(col("probeset_id"), col("probeset"), col("platform"), col("organism"))
    val registry = refreshed
      .select(col("probeset_id"), col("probeset"), col("platform"), col("organism"))
      .unionByName(freshWithIds)

    // 3. de_mrna_annotation via the registry join (:166-232)
    val annotated = stagedDistinct
      .join(broadcast(registry),
        stagedDistinct("probe_id") === registry("probeset") &&
          stagedDistinct("gpl_id") === registry("platform") &&
          coalesce(stagedDistinct("organism"), lit(DefaultOrganism)) ===
            coalesce(registry("organism"), lit(DefaultOrganism)))
      .select(col("gpl_id"), col("probe_id"), col("gene_symbol"),
        col("gene_id").try_cast("long").as("gene_id"), col("probeset_id"),
        coalesce(stagedDistinct("organism"), lit(DefaultOrganism)).as("organism"))
      .distinct()

    // 4. + 5. gene registry backfills (:239-289)
    val genes = bioMarkers.filter(upper(col("bio_marker_type")) === "GENE")
    val idBySymbol = genes
      .groupBy(col("bio_marker_name").as("bm_symbol"),
        upper(col("organism")).as("bm_org"))
      .agg(min(col("primary_external_id").try_cast("long")).as("bm_gene_id"))
    val symbolById = genes
      .groupBy(col("primary_external_id").try_cast("long").as("bm_gene_id2"),
        upper(col("organism")).as("bm_org2"))
      .agg(min(col("bio_marker_name")).as("bm_symbol2"))

    val mrna = annotated
      .join(broadcast(idBySymbol),
        annotated("gene_id").isNull && annotated("gene_symbol").isNotNull &&
          annotated("gene_symbol") === idBySymbol("bm_symbol") &&
          upper(annotated("organism")) === idBySymbol("bm_org"), "left")
      .withColumn("gene_id", coalesce(col("gene_id"), col("bm_gene_id")))
      .drop("bm_symbol", "bm_org", "bm_gene_id")
      .join(broadcast(symbolById),
        col("gene_symbol").isNull && col("gene_id").isNotNull &&
          col("gene_id") === symbolById("bm_gene_id2") &&
          upper(col("organism")) === symbolById("bm_org2"), "left")
      .withColumn("gene_symbol", coalesce(col("gene_symbol"), col("bm_symbol2")))
      .drop("bm_gene_id2", "bm_org2", "bm_symbol2")

    AnnotationTables(registry, mrna)
  }
}

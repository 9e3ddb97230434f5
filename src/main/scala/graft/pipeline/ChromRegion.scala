package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chromosomal-region platform registry — the Spark rebuild of
  * `i2b2_load_chrom_region` (reference
  * sql/postgres/procedures/I2B2_LOAD_CHROM_REGION.sql:49-229), the
  * registry the aCGH (and RNASeq) loads resolve their regions against.
  *
  * Functional rewrite of the reference's DML sequence:
  *  1. remove the platform's previous region definitions and its
  *     de_gpl_info row (:59-96)
  *  2. insert one de_gpl_info row, marker_type 'Chromosomal', title
  *     defaulting to the platform id (:99-130)
  *  3. insert the staged region definitions (:133-171)
  *  4. gene_id backfill where null: biomart GENE markers grouped by
  *     (symbol, organism), min(primary_external_id) (:173-200)
  *  5. gene_symbol backfill where null: GENE markers grouped by
  *     (gene_id, organism), min(symbol) (:202-229)
  *
  * region_id: the reference draws it from a serial; we keep existing rows'
  * ids and assign new rows max(existing)+dense-rank over (gpl_id,
  * region_name) so runs (and engines) agree.
  *
  * Scale: the registry, staged platform and bio_marker tables are all
  * dimension-sized (one platform ~10^4..10^6 regions), so every join here
  * broadcasts; nothing fact-scale is touched.
  */
object ChromRegion {

  final case class ChromRegionTables(regions: DataFrame, gplInfo: DataFrame)

  /** aCGH platform annotation file, positional per
    * aCGHPlatform.groovy:55-69: cols 1..9 = region_name, chromosome,
    * start_bp, end_bp, num_probes, cytoband, gene_symbol, gene_id,
    * organism (empty gene_id -> null; organism falls back to the
    * `#SPECIES` meta header). Returns (meta, staged lt_chromosomal_region
    * frame). */
  def readAcghPlatform(spark: SparkSession, path: String,
                       gplId: String): (Map[String, String], DataFrame) = {
    val meta = graft.sources.TsvReader.metaHeader(spark, path)
    val df = graft.sources.TsvReader.read(spark, path)
    val c = df.columns
    require(c.length >= 10, s"aCGH platform file needs 10 columns, got ${c.length}")
    def s(i: Int) = col(s"`${c(i)}`")
    val staged = df.select(
      lit(gplId).as("gpl_id"),
      s(1).as("region_name"),
      s(2).as("chromosome"),
      // try_cast: user platform cells — malformed coordinates null out
      // instead of throwing from the scan under ANSI (fuzz discipline)
      s(3).try_cast("int").as("start_bp"),
      s(4).try_cast("int").as("end_bp"),
      s(5).try_cast("int").as("num_probes"),
      s(6).as("cytoband"),
      when(length(coalesce(s(7), lit(""))) > 0, s(7)).as("gene_symbol"),
      when(length(coalesce(s(8), lit(""))) > 0, s(8)).try_cast("long").as("gene_id"),
      coalesce(when(length(coalesce(s(9), lit(""))) > 0, s(9)),
        lit(meta.getOrElse("SPECIES", null)).cast("string")).as("organism"))
    (meta, staged)
  }

  /** I2B2_ADD_PLATFORM (reference
    * sql/postgres/procedures/I2B2_ADD_PLATFORM.sql:24-27): one de_gpl_info
    * row appended. The reference leaves duplicate platform rows to the
    * PK; here the platform's existing row is replaced (the null-safe
    * delete the other registry loads use). */
  def addPlatform(gplInfo: DataFrame, gplId: String, title: String,
                  organism: String, markerType: String,
                  genomeBuild: String = null, releaseNbr: String = null): DataFrame = {
    val spark = gplInfo.sparkSession
    import spark.implicits._
    gplInfo.filter(!(col("platform") <=> lit(gplId))).unionByName(
      Seq((gplId, title, organism, markerType,
        Option(genomeBuild).orNull, Option(releaseNbr).orNull))
        .toDF("platform", "title", "organism", "marker_type",
          "genome_build", "release_nbr"),
      allowMissingColumns = true)
  }

  /** @param staged     lt_chromosomal_region: (gpl_id, region_name,
    *                   chromosome, start_bp, end_bp, num_probes, cytoband,
    *                   gene_symbol, gene_id: long, organism) — ONE platform
    * @param regions    de_chromosomal_region incl. region_id: long
    * @param gplInfo    de_gpl_info: (platform, title, organism,
    *                   marker_type, release_nbr)
    * @param bioMarkers biomart.bio_marker: (bio_marker_name, organism,
    *                   primary_external_id: string, bio_marker_type) */
  def load(spark: SparkSession, staged: DataFrame, regions: DataFrame,
           gplInfo: DataFrame, bioMarkers: DataFrame,
           platformTitle: String = "", genomeRelease: String = ""): ChromRegionTables = {
    // ONE driver round-trip for every scalar the proc reads up front: the
    // staged platform set (SELECT DISTINCT gpl_id INTO — exactly one) and
    // the staged organism (min for determinism — the reference's SELECT
    // DISTINCT INTO is order-luck). Sequential sub-second collects are what
    // dominate dimension-pipeline latency, not the data.
    val scalars = staged.agg(
      collect_set(col("gpl_id")).as("gpls"),
      max(col("gpl_id").isNull).as("has_null_gpl"), // collect_set drops nulls
      min(col("organism")).as("organism")).collect()(0)
    val gplIds = scalars.getSeq[String](0)
    val hasNullGpl = !scalars.isNullAt(1) && scalars.getBoolean(1)
    val nPlatforms = gplIds.length + (if (hasNullGpl) 1 else 0)
    require(nPlatforms == 1,
      s"lt_chromosomal_region must stage exactly one platform, got $nPlatforms")
    val gplId = gplIds.headOption.orNull
    val organism = scalars.getString(2)

    // 1. previous definitions for the platform go (:59-96); null-keyed
    //    rows of OTHER platforms survive (=!= would drop them)
    val keptRegions = regions.filter(!(col("gpl_id") <=> lit(gplId)))
    val keptGpl = gplInfo.filter(!(col("platform") <=> lit(gplId)))

    // 2. the platform row (:99-130)
    import spark.implicits._
    val newGpl = keptGpl.unionByName(
      Seq((gplId, if (platformTitle.isEmpty) gplId else platformTitle,
        organism, "Chromosomal", genomeRelease))
        .toDF("platform", "title", "organism", "marker_type", "release_nbr"),
      allowMissingColumns = true)

    // 4. gene_id backfill (:173-200)
    val genes = bioMarkers.filter(upper(col("bio_marker_type")) === "GENE")
    val idBySymbol = genes
      .groupBy(col("bio_marker_name").as("bm_symbol"),
        upper(col("organism")).as("bm_org"))
      .agg(min(col("primary_external_id").try_cast("long")).as("bm_gene_id"))
    val withIds = staged
      .join(broadcast(idBySymbol),
        col("gene_id").isNull && col("gene_symbol").isNotNull &&
          col("gene_symbol") === col("bm_symbol") &&
          upper(col("organism")) === col("bm_org"), "left")
      .withColumn("gene_id", coalesce(col("gene_id"), col("bm_gene_id")))
      .drop("bm_symbol", "bm_org", "bm_gene_id")

    // 5. gene_symbol backfill (:202-229) — sees step 4's ids, like the
    //    reference's sequential UPDATEs
    val symbolById = genes
      .groupBy(col("primary_external_id").try_cast("long").as("bm_gene_id2"),
        upper(col("organism")).as("bm_org2"))
      .agg(min(col("bio_marker_name")).as("bm_symbol2"))
    val backfilled = withIds
      .join(broadcast(symbolById),
        col("gene_symbol").isNull && col("gene_id").isNotNull &&
          col("gene_id") === col("bm_gene_id2") &&
          upper(col("organism")) === col("bm_org2"), "left")
      .withColumn("gene_symbol", coalesce(col("gene_symbol"), col("bm_symbol2")))
      .drop("bm_gene_id2", "bm_org2", "bm_symbol2")

    // 3. insert with deterministic region ids; the max-id aggregate rides
    //    inside denseIds' own counts job (no separate collect)
    val inserted = graft.core.Ids.denseIdsAfter(
      backfilled, Seq("gpl_id", "region_name"), "region_id",
      keptRegions.agg(coalesce(max(col("region_id")), lit(0L))))
    ChromRegionTables(
      keptRegions.unionByName(inserted, allowMissingColumns = true), newGpl)
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The study-metadata load — `I2B2_LOAD_STUDY_METADATA` (reference
  * sql/postgres/procedures/I2B2_LOAD_STUDY_METADATA.sql) as a functional
  * rewrite over the biomart tables. One `_MetaData` file row (parsed by
  * OmicsSources.readStudyMetadata, S9) drives:
  *
  *  1. bio_experiment upsert keyed on accession (:103-260) with the
  *     reference's CAPS tokens: `STUDY_DESIGN:` / `STUDY_INSTITUTION:` /
  *     `STUDY_BIOMARKER_TYPE:` / `STUDY_ACCESS_TYPE:` +
  *     upper(spaces->underscores); PI falls back to the study owner
  *  2. bio_data_uid `EXP:<accession>` upsert
  *  3. `;`-separated compound / disease / organism lists -> bio_compound /
  *     bio_disease / bio_taxonomy upserts (NOT-EXISTS on the upper-cased
  *     name, :340-600) + bio_data_* link rows with etl_source
  *     `METADATA:<study>`
  *  4. the NCBI repository row when absent and the GEO link
  *     `geo/query/acc.cgi?acc=<study>` into bio_content (:603-700)
  *
  * Surrogate ids are max+1 assignments (the reference draws sequences);
  * every frame here is metadata-sized, so the whole load is driver-cheap
  * and broadcast-friendly.
  */
object StudyMetadata {

  final case class BioTables(
      bioExperiment: DataFrame, bioDataUid: DataFrame,
      bioCompound: DataFrame, bioDataCompound: DataFrame,
      bioDisease: DataFrame, bioDataDisease: DataFrame,
      bioTaxonomy: DataFrame, bioDataTaxonomy: DataFrame,
      bioContentRepository: DataFrame, bioContent: DataFrame)

  def empty(spark: SparkSession): BioTables = {
    import org.apache.spark.sql.types._
    def df(fields: (String, DataType)*): DataFrame =
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(fields.map { case (n, t) => StructField(n, t) }))
    BioTables(
      bioExperiment = df("bio_experiment_id" -> LongType, "accession" -> StringType,
        "title" -> StringType, "description" -> StringType, "design" -> StringType,
        "primary_investigator" -> StringType, "institution" -> StringType,
        "biomarker_type" -> StringType, "access_type" -> StringType),
      bioDataUid = df("bio_data_id" -> LongType, "unique_id" -> StringType),
      bioCompound = df("bio_compound_id" -> LongType, "generic_name" -> StringType),
      bioDataCompound = df("bio_data_id" -> LongType, "bio_compound_id" -> LongType,
        "etl_source" -> StringType),
      bioDisease = df("bio_disease_id" -> LongType, "disease" -> StringType),
      bioDataDisease = df("bio_data_id" -> LongType, "bio_disease_id" -> LongType,
        "etl_source" -> StringType),
      bioTaxonomy = df("bio_taxonomy_id" -> LongType, "taxon_name" -> StringType),
      bioDataTaxonomy = df("bio_data_id" -> LongType, "bio_taxonomy_id" -> LongType,
        "etl_source" -> StringType),
      bioContentRepository = df("bio_content_repo_id" -> LongType,
        "location" -> StringType, "active_y_n" -> StringType,
        "repository_type" -> StringType, "location_type" -> StringType),
      bioContent = df("bio_content_id" -> LongType, "repository_id" -> LongType,
        "location" -> StringType, "file_type" -> StringType))
  }

  /** `'PREFIX:' || upper(regexp_replace(v, ' ', '_', 'g'))` (:109-125). */
  private[pipeline] def token(prefix: String, v: Option[String]): Option[String] =
    v.map(_.trim).filter(_.nonEmpty)
      .map(x => prefix + x.toUpperCase.replaceAll(" ", "_"))

  private def splitList(v: Option[String]): Seq[String] =
    v.toSeq.flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)

  private def maxId(df: DataFrame, idCol: String): Long = {
    val r = df.agg(coalesce(max(col(idCol)), lit(0L))).collect()(0)
    r.getLong(0)
  }

  /** One study's metadata folded into the biomart tables. */
  def load(spark: SparkSession, meta: Map[String, String],
           t0: BioTables): BioTables = {
    import spark.implicits._
    val studyId = meta.getOrElse("study_id",
      throw new IllegalArgumentException("Study ID column is not defined"))
    def attr(k: String): Option[String] = meta.get(k).map(_.trim).filter(_.nonEmpty)

    // 1. bio_experiment upsert (:103-260)
    val expId = {
      val existing = t0.bioExperiment.filter(col("accession") === studyId)
        .select(col("bio_experiment_id")).collect().headOption.map(_.getLong(0))
      existing.getOrElse(maxId(t0.bioExperiment, "bio_experiment_id") + 1)
    }
    val expRow = Seq((expId, studyId,
      attr("title").orNull, attr("description").orNull,
      token("STUDY_DESIGN:", attr("study_design")).orNull,
      attr("pi").orElse(attr("study_owner")).orNull,
      token("STUDY_INSTITUTION:", attr("institution")).orNull,
      token("STUDY_BIOMARKER_TYPE:", attr("biomarker_type")).orNull,
      token("STUDY_ACCESS_TYPE:", attr("access_type")).orNull))
      .toDF("bio_experiment_id", "accession", "title", "description", "design",
        "primary_investigator", "institution", "biomarker_type", "access_type")
    val bioExperiment = t0.bioExperiment.filter(col("accession") =!= studyId)
      .unionByName(expRow)

    // 2. bio_data_uid (:262-300)
    val bioDataUid = t0.bioDataUid.filter(col("unique_id") =!= s"EXP:$studyId")
      .unionByName(Seq((expId, s"EXP:$studyId")).toDF("bio_data_id", "unique_id"))

    // 3. `;`-lists -> registry upsert by upper(name) + link rows (:340-600)
    def listLoad(values: Seq[String], registry: DataFrame, idCol: String,
                 nameCol: String, links: DataFrame):
        (DataFrame, DataFrame) = {
      val existingNames = registry.select(col(idCol), upper(col(nameCol)).as("u"))
        .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      var nextId = maxId(registry, idCol)
      val fresh = values.filterNot(v => existingNames.contains(v.toUpperCase))
        .map { v => nextId += 1; (nextId, v) }
      val registryOut =
        if (fresh.isEmpty) registry
        else registry.unionByName(fresh.toDF(idCol, nameCol))
      val idOf = existingNames ++ fresh.map { case (i, v) => v.toUpperCase -> i }
      val linkRows = values.map(v => (expId, idOf(v.toUpperCase), s"METADATA:$studyId"))
      val linksOut = links
        .filter(!(col("bio_data_id") === expId &&
          col("etl_source") === s"METADATA:$studyId"))
        .unionByName(linkRows.toDF("bio_data_id", idCol, "etl_source"))
      (registryOut, linksOut)
    }
    val (bioCompound, bioDataCompound) = listLoad(splitList(attr("drug_name")),
      t0.bioCompound, "bio_compound_id", "generic_name", t0.bioDataCompound)
    val (bioDisease, bioDataDisease) = listLoad(splitList(attr("condition")),
      t0.bioDisease, "bio_disease_id", "disease", t0.bioDataDisease)
    val (bioTaxonomy, bioDataTaxonomy) = listLoad(splitList(attr("species")),
      t0.bioTaxonomy, "bio_taxonomy_id", "taxon_name", t0.bioDataTaxonomy)

    // 4. NCBI repository + GEO link (:603-700)
    val ncbiId = t0.bioContentRepository
      .filter(col("repository_type") === "NCBI" && col("location_type") === "URL")
      .select(col("bio_content_repo_id")).collect().headOption.map(_.getLong(0))
    val (repoOut, repoId) = ncbiId match {
      case Some(i) => (t0.bioContentRepository, i)
      case None =>
        val i = maxId(t0.bioContentRepository, "bio_content_repo_id") + 1
        (t0.bioContentRepository.unionByName(
          Seq((i, "http://www.ncbi.nlm.nih.gov/", "Y", "NCBI", "URL"))
            .toDF("bio_content_repo_id", "location", "active_y_n",
              "repository_type", "location_type")), i)
    }
    val geoLoc = s"geo/query/acc.cgi?acc=$studyId"
    val bioContent = t0.bioContent.filter(col("location") =!= geoLoc)
      .unionByName(Seq((maxId(t0.bioContent, "bio_content_id") + 1, repoId,
        geoLoc, "Data")).toDF("bio_content_id", "repository_id", "location",
        "file_type"))

    BioTables(bioExperiment, bioDataUid, bioCompound, bioDataCompound,
      bioDisease, bioDataDisease, bioTaxonomy, bioDataTaxonomy,
      repoOut, bioContent)
  }
}

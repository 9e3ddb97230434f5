package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MetadataXml
import graft.sources.TsvReader

/** The two small datatype loads not covered by the shared omics pipeline. */
object SnpAndSerial {

  import org.apache.spark.sql.types._

  private val CallsSchema = StructType(Seq(
    StructField("gsm_num", StringType), StructField("snp_name", StringType),
    StructField("snp_calls", StringType)))

  private val CopyNumberSchema = StructType(Seq(
    StructField("gsm_num", StringType), StructField("snp_name", StringType),
    StructField("chrom", StringType), StructField("chrom_pos", LongType),
    StructField("copy_number", DoubleType)))

  private def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  /** SNP calls file family -> lt_snp_calls_by_gsm
    * (SNPDataProcessor.groovy:117-120): columns are taken by POSITION
    * (CsvFileLoader inserts into [GSM_NUM, SNP_NAME, SNP_CALLS]
    * positionally — the fixture files' own headers say
    * SAMPLE_ID/PROBESET_ID/CALLS), CsvLikeFile semantics (comment skip,
    * row repair). The reference loads each file on a 4-thread pool with
    * JDBC batches; here every file is one distributed scan and the union
    * is task-parallel. An absent file family yields an empty frame (the
    * reference simply iterates zero files), so a one-sided load still
    * merges. */
  def readSnpCalls(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map { p =>
      val df = TsvReader.read(spark, p)
      val c = df.columns
      require(c.length >= 3,
        s"SNP calls file $p needs 3 columns, got ${c.length}")
      df.select(
        col(c(0)).as("gsm_num"),
        col(c(1)).as("snp_name"),
        col(c(2)).as("snp_calls"))
    }.reduceOption(_ unionByName _)
      .getOrElse(emptyFrame(spark, CallsSchema))

  /** SNP copy-number file family -> lt_snp_copy_number
    * (SNPDataProcessor.groovy:122-128): positional [GSM_NUM, SNP_NAME,
    * CHROM, CHROM_POS, COPY_NUMBER] with the reference's long/double
    * casts. */
  def readSnpCopyNumber(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map { p =>
      val df = TsvReader.read(spark, p)
      val c = df.columns
      require(c.length >= 5,
        s"SNP copy-number file $p needs 5 columns, got ${c.length}")
      df.select(
        col(c(0)).as("gsm_num"),
        col(c(1)).as("snp_name"),
        col(c(2)).as("chrom"),
        // try_cast: malformed positions/values null out instead of
        // throwing from the scan under ANSI (fuzz discipline)
        col(c(3)).try_cast("long").as("chrom_pos"),
        col(c(4)).try_cast("double").as("copy_number"))
    }.reduceOption(_ unionByName _)
      .getOrElse(emptyFrame(spark, CopyNumberSchema))

  /** The SNP mapping file names each sample's calls / copy-number files
    * (columns CALLS_FILE_NAME, COPY_NUMBER_FILE_NAME —
    * SNPDataProcessor.groovy processMappingFile); resolve them against
    * the upload dir into the two file families. Either column may be
    * absent or empty for a one-sided load. */
  def snpFileLists(mapping: DataFrame, dir: String): (Seq[String], Seq[String]) = {
    def files(colName: String): Seq[String] =
      if (!mapping.columns.contains(colName)) Seq.empty
      else mapping.select(col(colName)).collect()
        .map(_.getString(0)).filter(f => f != null && f.nonEmpty)
        .distinct.map(f => s"$dir/$f").toSeq
    (files("CALLS_FILE_NAME"), files("COPY_NUMBER_FILE_NAME"))
  }

  /** SNP: calls FULL OUTER copy-number on (gsm, snp_name), keys coalesced
    * (I2B2_PROCESS_SNP_DATA.sql:108-117). */
  def mergeSnp(calls: DataFrame, copyNumber: DataFrame): DataFrame =
    calls.join(copyNumber, Seq("gsm_num", "snp_name"), "full_outer")

  /** End-to-end SNP file load: read both families and merge. */
  def loadSnp(spark: SparkSession, callsFiles: Seq[String],
              copyNumberFiles: Seq[String]): DataFrame =
    mergeSnp(readSnpCalls(spark, callsFiles),
      readSnpCopyNumber(spark, copyNumberFiles))

  /** Serial-HDD sample-dimensions mapping -> (category_cd, c_metadataxml)
    * (SerialHDDDataLoader.groovy:46-88): one row per mapped category,
    * underscores in the category become spaces, and the XML carries the
    * file's (value, unit, display label) VERBATIM — unlike the
    * display-name-parsing builder in [[stampSeriesMetadata]], nothing is
    * converted to minutes here. The template reproduces the reference's
    * exact string (indentation included). */
  def readSampleDimensions(spark: SparkSession, path: String): DataFrame = {
    val df = TsvReader.read(spark, path)
    val Seq(cat, value, unit, label) = df.columns.take(4).toSeq.map(col)
    val xml =
      "<?xml version=\"1.0\"?>\n                        <ValueMetadata>\n" +
      "                            <Oktousevalues>Y</Oktousevalues>\n" +
      "                            <SeriesMeta>\n" +
      "                                <Value>%s</Value>\n" +
      "                                <Unit>%s</Unit>\n" +
      "                                <DisplayName>%s</DisplayName>\n" +
      "                            </SeriesMeta>\n" +
      "                    </ValueMetadata>"
    df.select(
      regexp_replace(cat, "_", " ").as("category_cd"),
      format_string(xml, value, unit, label).as("c_metadataxml"))
  }

  final case class SerialHddTables(
      i2b2: DataFrame, sampleDimension: DataFrame, facts: DataFrame)

  /** The full serial-HDD apply step (I2B2_PROCESS_SERIAL_HDD_DATA.sql:
    * 61-140) as three functional rewrites:
    *
    *  1. stamp `c_metadataxml` onto the study's ontology nodes whose
    *     c_name matches a mapped category and whose basecode is one of the
    *     study's mapped sample concepts (:61-74);
    *  2. `sample_dimension` upsert — every mapped sample_cd not already
    *     registered (:93-95);
    *  3. `observation_fact.sample_cd` backfill from the sample mapping on
    *     (concept, patient) (:113-125). The reference's UPDATE picks an
    *     arbitrary row when a (concept, patient) maps several samples; we
    *     take the MIN sample_cd (documented deterministic tiebreak).
    *
    * The dims/mapping frames are dimension-sized -> broadcast; the fact
    * backfill is the only join touching a large frame and it broadcasts
    * the small side. */
  def applySerialHdd(i2b2: DataFrame, dims: DataFrame,
                     sampleMapping: DataFrame, sampleDimension: DataFrame,
                     facts: DataFrame, trialId: String): SerialHddTables = {
    val base =
      if (i2b2.columns.contains("c_metadataxml")) i2b2
      else i2b2.withColumn("c_metadataxml", lit(null).cast("string"))
    val mapped = broadcast(
      sampleMapping.filter(col("trial_name") === trialId)
        .select(col("concept_code").as("c_basecode")).distinct()
        .withColumn("__mapped", lit(true)))
    val dimsB = broadcast(dims.select(
      col("category_cd").as("__cat"), col("c_metadataxml").as("__xml")))
    val stamped = base
      .join(mapped, Seq("c_basecode"), "left")
      .join(dimsB, col("c_name") === col("__cat"), "left")
      .withColumn("c_metadataxml",
        when(col("__mapped") && col("sourcesystem_cd") === trialId &&
          col("__xml").isNotNull, col("__xml"))
          .otherwise(col("c_metadataxml")))
      .drop("__mapped", "__cat", "__xml")

    val newSamples = sampleMapping.filter(col("trial_name") === trialId)
      .select(col("sample_cd")).distinct()
      .join(sampleDimension, Seq("sample_cd"), "left_anti")
    val sampleDim = sampleDimension.unionByName(newSamples)

    val sm = sampleMapping.filter(col("trial_name") === trialId)
      .groupBy(col("concept_code").as("concept_cd"),
        col("patient_id").as("patient_num"))
      .agg(min(col("sample_cd")).as("__sample_cd"))
    val withSample = facts.join(broadcast(sm), Seq("concept_cd", "patient_num"), "left")
      .withColumn("sample_cd",
        if (facts.columns.contains("sample_cd"))
          coalesce(col("__sample_cd"), col("sample_cd"))
        else col("__sample_cd"))
      .drop("__sample_cd")

    SerialHddTables(stamped, sampleDim, withSample)
  }

  /** Serial-HDD (time-series) concepts: stamp each TIMEPOINT node with its
    * ValueMetadata XML — the UPDATE..FROM at I2B2_PROCESS_SERIAL_HDD_DATA
    * .sql:62-74,112-134 as a functional column rewrite. Nodes whose
    * display name does not parse keep a NULL metadataxml (the reference
    * raises; callers decide via [[unparseable]]). */
  def stampSeriesMetadata(nodes: DataFrame, nameCol: String): DataFrame =
    nodes.withColumn("c_metadataxml",
      MetadataXml.metadataXml(col(nameCol), lit("T"), lit("TIMEPOINT")))

  def unparseable(stamped: DataFrame): DataFrame =
    stamped.filter(col("c_metadataxml").isNull)
}

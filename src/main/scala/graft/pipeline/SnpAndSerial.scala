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
    * (SNPDataProcessor.groovy:117-120): TSV with header GSM_NUM SNP_NAME
    * SNP_CALLS, CsvLikeFile semantics (comment skip, row repair). The
    * reference loads each file on a 4-thread pool with JDBC batches; here
    * every file is one distributed scan and the union is task-parallel.
    * An absent file family yields an empty frame (the reference simply
    * iterates zero files), so a one-sided load still merges. */
  def readSnpCalls(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map { p =>
      TsvReader.read(spark, p).select(
        col("GSM_NUM").as("gsm_num"),
        col("SNP_NAME").as("snp_name"),
        col("SNP_CALLS").as("snp_calls"))
    }.reduceOption(_ unionByName _)
      .getOrElse(emptyFrame(spark, CallsSchema))

  /** SNP copy-number file family -> lt_snp_copy_number
    * (SNPDataProcessor.groovy:122-128): GSM_NUM SNP_NAME CHROM CHROM_POS
    * COPY_NUMBER with the reference's long/double casts. */
  def readSnpCopyNumber(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map { p =>
      TsvReader.read(spark, p).select(
        col("GSM_NUM").as("gsm_num"),
        col("SNP_NAME").as("snp_name"),
        col("CHROM").as("chrom"),
        col("CHROM_POS").cast("long").as("chrom_pos"),
        col("COPY_NUMBER").cast("double").as("copy_number"))
    }.reduceOption(_ unionByName _)
      .getOrElse(emptyFrame(spark, CopyNumberSchema))

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

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MetadataXml

/** The two small datatype loads not covered by the shared omics pipeline. */
object SnpAndSerial {

  /** SNP: calls FULL OUTER copy-number on (gsm, snp_name), keys coalesced
    * (I2B2_PROCESS_SNP_DATA.sql:108-117). The reference loads the two file
    * families on a 4-thread pool; here both sides are DataFrames and the
    * parallelism is task-level. */
  def mergeSnp(calls: DataFrame, copyNumber: DataFrame): DataFrame =
    calls.join(copyNumber, Seq("gsm_num", "snp_name"), "full_outer")

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

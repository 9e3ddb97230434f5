package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-side layout control — the lakehouse replacement for the
  * reference's partition-per-dataset DDL and work-table indexes
  * (SURVEY §4):
  *
  *  - [[writePartitioned]]: directory partitioning (trial / source_cd);
  *    readers prune partitions natively.
  *  - [[writeBucketed]]: hash-bucketed + sorted table on the join key.
  *    Two tables bucketed the same way join with ZERO exchange — the
  *    shuffle happens once at write time, then every subsequent
  *    fact-to-fact join (e.g. observation_fact x de_subject_sample_mapping
  *    on patient) is co-located. This is the knob that matters at 100 TB:
  *    the big-big join that AQE cannot broadcast stops shuffling at all.
  */
object TableWriter {

  def writePartitioned(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .format("parquet")
      .saveAsTable(table)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** S7: the JDBC batch sink — the declared staging path of the reference
    * (DataLoader batches of 100/500/1000, ClinicalDataProcessor.groovy:
    * 238-251; SNP threads each with their own connection,
    * SNPDataProcessor.groovy:86-115). `df.write.jdbc` gives one connection
    * per partition writing `batchsize`-row batches — the reference's
    * thread pool dissolves into task parallelism. `numPartitions` caps the
    * connection count so a 1000-executor cluster doesn't open 1000
    * connections against one staging database. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "append", batchSize: Int = 1000,
                numPartitions: Option[Int] = None,
                properties: java.util.Properties = new java.util.Properties()): Unit = {
    val bounded = numPartitions.map(df.coalesce).getOrElse(df)
    properties.setProperty("batchsize", batchSize.toString)
    bounded.write.mode(mode).jdbc(url, table, properties)
  }

  def readJdbc(spark: SparkSession, url: String, table: String,
               properties: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, properties)
}

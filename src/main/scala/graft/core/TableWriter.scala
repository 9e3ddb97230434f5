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
}

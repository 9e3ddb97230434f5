package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the driver-provided test tables (TESTDATA.md) and the
  * fixed output-schema star model the engine produces (SURVEY §1.3).
  *
  * At 100 TB the per-table parquet path becomes a partitioned directory;
  * everything here reads through `spark.read.parquet` so partition
  * discovery / pruning and the vectorized reader apply unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

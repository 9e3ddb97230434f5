package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic surrogate-id assignment (the sequence replacement,
  * SURVEY §7.3) — two shapes:
  *
  *  - [[denseIds]]: 1..N in the order of `sortCols`, computed
  *    DataFrame-native: range-partitioned sort, per-partition record
  *    numbers from `monotonically_increasing_id`, and a broadcast join
  *    against the (tiny) per-partition offset table. No single-task global
  *    window and no RDD round-trip, so the plan stays in whole-stage
  *    codegen / columnar batches end-to-end and scales to warehouse-sized
  *    dimension tables. Deterministic as long as `sortCols` is a total
  *    order.
  *  - [[windowIds]]: the plain row_number form — single-partition plan,
  *    kept ONLY for tests/comparison; nothing in a pipeline should call it.
  */
object Ids {

  def denseIds(df: DataFrame, sortCols: Seq[String], idCol: String,
               startAt: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // monotonically_increasing_id = (partition id << 33) | record number
    // within the partition (documented layout); masking the low 33 bits
    // yields the 0-based rank within the range partition, evaluated after
    // the within-partition sort so it follows sortCols order.
    val sorted = df
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      // Persisted because two jobs consume this frame (the offset count and
      // the final result) and the range-partitioner's boundary sampling is
      // only stable within one materialization. Dimension-sized inputs only.
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts = sorted.groupBy(col("__pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = startAt
    val offsets = counts.map { case (p, c) => val o = (p, acc); acc += c; o }

    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    sorted.join(offDf, "__pid")
      .withColumn(idCol, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  def windowIds(df: DataFrame, sortCols: Seq[String], idCol: String): DataFrame =
    df.withColumn(idCol, row_number()
      .over(org.apache.spark.sql.expressions.Window.orderBy(sortCols.map(col): _*))
      .cast("long"))
}

package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic surrogate-id assignment (the sequence replacement,
  * SURVEY §7.3) — two shapes:
  *
  *  - [[denseIds]]: 1..N in the order of `sortCols`, computed with a
  *    distributed range sort + per-partition offsets (RDD zipWithIndex):
  *    no single-task global window, so it scales to warehouse-sized
  *    dimension tables. Deterministic as long as `sortCols` is a total
  *    order.
  *  - [[windowIds]]: the plain row_number form — simpler plan, fine for
  *    bounded dims; kept for comparison/tests.
  */
object Ids {

  def denseIds(df: DataFrame, sortCols: Seq[String], idCol: String,
               startAt: Long = 1L): DataFrame = {
    val sorted = df.orderBy(sortCols.map(col): _*) // range-partitioned sort
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  def windowIds(df: DataFrame, sortCols: Seq[String], idCol: String): DataFrame =
    df.withColumn(idCol, row_number()
      .over(org.apache.spark.sql.expressions.Window.orderBy(sortCols.map(col): _*))
      .cast("long"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch-profiling shim (not part of the library surface). */
object SimilarityProbe {
  def encodeFold(vectors: DataFrame, idCol: String, vecCol: String,
                 codebooks: DataFrame): DataFrame =
    Similarity.pqEncodeWithFold(vectors, idCol, vecCol, codebooks)

  /** The r7 interpreted pqTopKWith, reproduced for A/B timing. */
  def pqTopKFold(vectors: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, codebooks: DataFrame): DataFrame = {
    val cbs = codebooks.collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Long]("code_id"),
        r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toIndexedSeq).toIndexedSeq
    val subLen = cbs(0)(0).length
    def subDist(vec: Column, start: Int, cw: Array[Double]): Column =
      round(aggregate(
        zip_with(slice(vec, start + 1, cw.length), array(cw.map(lit): _*),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v), 6)
    val dtab = array(cbs.indices.map { s =>
      array(cbs(s).map(cw => subDist(col(vecCol), s * subLen, cw)): _*)
    }: _*)
    val q = broadcast(queries.select(col(idCol).as("q_id"), dtab.as("__dtab")))
    val enc = encodeFold(vectors, idCol, vecCol, codebooks)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    q.join(enc, col("q_id") =!= col("neighbor_id"))
      .withColumn("adc_dist",
        round(aggregate(
          zip_with(col("__dtab"), col("codes"),
            (row, c) => element_at(row, (c + 1).cast("int"))),
          lit(0.0), (acc, v) => acc + v), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
  }
}

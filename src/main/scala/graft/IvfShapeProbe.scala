package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity}

/** Same-JVM A/B of the three ann_ivf probe-selection/rank shapes the
  * round-12 work moved between — the only window-drift-proof way to
  * attribute the bench deltas (BENCH host noise memo): r11's
  * row_number windows, the r12 first cut (k-capped aggregate + query
  * join-back, still DataFrame centroids), and the shipped literal-
  * centroid form. All three must return identical rows. */
object IvfShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 20)
    val (idCol, vecCol, k, numLists, nprobe) = ("vec_id", "embedding", 10, 16, 4)
    val centroids = Similarity.seedCentroids(vecs, idCol, vecCol, numLists)

    def r11Shape(): DataFrame = {
      val cents = broadcast(centroids.select(col("centroid_id"), col("c_vec"),
        Similarity.l2Norm(col("c_vec")).as("c_norm")))
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(col("c_cos").desc, col("centroid_id"))
      val probes = broadcast(queries
        .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
          Similarity.l2Norm(col(vecCol)).as("q_norm"))
        .join(cents)
        .withColumn("c_cos", round(Similarity.dot(col("q_vec"), col("c_vec")) /
          (col("q_norm") * col("c_norm")), 6))
        .withColumn("__rn", row_number().over(wProbe))
        .filter(col("__rn") <= nprobe)
        .select(col("q_id"), col("q_vec"), col("q_norm"),
          col("centroid_id").as("list_id")))
      val assigned = Similarity.ivfAssignWith(vecs, idCol, vecCol, centroids)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
          col("__norm").as("n_norm"), col("list_id"))
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      probes.join(assigned, Seq("list_id"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(Similarity.dot(col("q_vec"), col("n_vec")) /
          (col("q_norm") * col("n_norm")), 6))
        .withColumn("rank", row_number().over(wRank).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
    }

    def firstCut(): DataFrame = {
      val cents = broadcast(centroids.select(col("centroid_id"), col("c_vec"),
        Similarity.l2Norm(col("c_vec")).as("c_norm")))
      val qf = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        Similarity.l2Norm(col(vecCol)).as("q_norm"))
      val probeSel = Sampling.topKPerGroup(
        qf.join(cents)
          .withColumn("c_cos", round(Similarity.dot(col("q_vec"), col("c_vec")) /
            (col("q_norm") * col("c_norm")), 6)),
        Seq("q_id"), "c_cos", "centroid_id", nprobe, numericIdOrder = true)
      val probes = broadcast(probeSel.join(qf, Seq("q_id"))
        .select(col("q_id"), col("q_vec"), col("q_norm"),
          col("centroid_id").as("list_id")))
      val assigned = Similarity.ivfAssignWith(vecs, idCol, vecCol, centroids)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
          col("__norm").as("n_norm"), col("list_id"))
      Sampling.topKPerGroup(
        probes.join(assigned, Seq("list_id"))
          .filter(col("q_id") =!= col("neighbor_id"))
          .withColumn("cosine", round(Similarity.dot(col("q_vec"), col("n_vec")) /
            (col("q_norm") * col("n_norm")), 6)),
        Seq("q_id"), "cosine", "neighbor_id", k, numericIdOrder = true)
        .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
    }

    def shipped(): DataFrame =
      Similarity.ivfTopKWith(vecs, queries, idCol, vecCol, k, nprobe, centroids)

    def time(label: String, f: () => DataFrame): Set[(Long, Long, Double, Long)] = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-16s min-of-3 $best%6.3f s")
      f().collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    }

    val a = time("r11-window", r11Shape _)
    val b = time("first-cut-agg", firstCut _)
    val c = time("literal-cents", shipped _)
    println(s"identical: r11==firstCut ${a == b}, r11==shipped ${a == c}")
    spark.stop()
  }
}

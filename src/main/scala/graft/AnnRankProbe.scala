package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-collection ANN rank probe (r11 VERDICT item 1's done-criterion):
  * ONE query against the full sf1 replica collection, timing the
  * round-11 row_number-window rank against the round-12 k-capped
  * aggregate rank, and printing per-stage task counts so the split is
  * visible, not inferred: the window's PARTITION BY q_id drags every
  * candidate row of the query into ONE sorted task, while the
  * aggregate's partial buffers rank inside each of the scan/exchange
  * tasks and only k-sized buffers reach the single merge task. */
object AnnRankProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      "/root/repo/target/sf1probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (numTasks, shuffle records read) per stage: the rank stage's INPUT
    // volume is the scale story — the window's final stage reads every
    // candidate row of the query; the aggregate's reads only the
    // k-capped partial buffers (one per upstream task)
    val stages = scala.collection.concurrent.TrieMap[Int, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages(sc.stageInfo.stageId) = (sc.stageInfo.numTasks,
          sc.stageInfo.taskMetrics.shuffleReadMetrics.recordsRead)
    })

    // inflate the replica's embeddings to a genuinely hot collection:
    // `mult` shifted copies (default 50 -> 1M vectors for one query)
    val mult = sys.env.getOrElse("SPARK_GRAFT_ANN_MULT", "50").toInt
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val vecs = base.crossJoin(
        spark.range(mult).select(col("id").as("__copy")))
      .select((col("vec_id") + col("__copy") * lit(100000000L)).as("vec_id"),
        col("embedding"))
      .localCheckpoint() // measure the rank, not the inflation
    val queries = vecs.filter(col("vec_id") === 0)
    println(s"collection rows: ${vecs.count()}")

    def run(label: String)(body: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      body
      val secs = (System.nanoTime() - t0) / 1e9
      // give the listener bus a beat to drain before reading counts
      Thread.sleep(500)
      val counts = stages.toSeq.sortBy(_._1)
        .map { case (_, (n, r)) => s"$n tasks/${r} recs" }
      println(f"$label%-10s $secs%7.3f s  stages: " +
        counts.mkString("[", " | ", "]"))
    }

    def id(c: String) = col(c)
    val norm = graft.operators.Similarity.l2Norm(col("embedding"))

    // warm the scan/JIT once
    vecs.select(norm.as("n")).write.format("noop").mode("overwrite").save()

    // --- round-11 shape: row_number window over ALL candidates --------
    val q = broadcast(queries.select(id("vec_id").as("q_id"),
      col("embedding").as("q_vec"), norm.as("q_norm")))
    val c = vecs.select(id("vec_id").as("neighbor_id"),
        col("embedding").as("n_vec"), norm.as("n_norm"))
      .repartition(cpus.toInt)
    val pairs = q.join(c, col("q_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(graft.operators.Similarity.dot(
        col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    for (_ <- 1 to 2) run("window") {
      pairs.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .write.format("noop").mode("overwrite").save()
    }

    // --- round-12 shape: the k-capped aggregate ------------------------
    for (_ <- 1 to 2) run("aggregate") {
      graft.operators.Similarity.bruteForceTopK(
          vecs, queries, "vec_id", "embedding", 10)
        .write.format("noop").mode("overwrite").save()
    }

    // cross-check: both shapes return the same top-10
    val viaAgg = graft.operators.Similarity.bruteForceTopK(
        vecs, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val viaWin = pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    println(s"results identical: ${viaAgg == viaWin}")
    spark.stop()
  }
}

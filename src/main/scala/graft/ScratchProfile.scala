package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling harness (not part of the library surface). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // log every job's duration + description
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("") +
            " stages=" + js.stageInfos.map(_.numTasks).mkString("+")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.remove(je.jobId)
        println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        if (secs > 0.15) {
          println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%-3d $secs%6.3f s  ${i.name.take(120)}")
          if (i.numTasks < 8) println("[stage-rdds] " + i.rddInfos
            .map(r => s"${r.id}:${r.name}${r.scope.map("@" + _.name).getOrElse("")}")
            .mkString(" | "))
        }
      }
    })

    // warm the session
    spark.range(10).count()

    import org.apache.spark.sql.functions._
    import operators.Similarity
    val e = core.Tables.load(spark, sfDir, "embeddings")
    val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", m = 8, codewords = 16)

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("encode native") {
        Similarity.pqEncodeWith(e, "vec_id", "embedding", cb)
          .write.format("noop").mode("overwrite").save()
      }
      time("encode fold") {
        graft.operators.SimilarityProbe.encodeFold(e, "vec_id", "embedding", cb)
          .write.format("noop").mode("overwrite").save()
      }
      val full = Similarity.pqTopKWith(e, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 10, cb)
      time("pqTopKWith full") {
        full.write.format("noop").mode("overwrite").save()
      }
      time("pqTopKWith r7 fold") {
        graft.operators.SimilarityProbe.pqTopKFold(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 10, cb)
          .write.format("noop").mode("overwrite").save()
      }
      if (round == 2) {
        // node names only: where codes/adc are computed relative to the join
        val pl = full.queryExecution.executedPlan.toString
        pl.linesIterator.foreach { l =>
          val t = l.take(200)
          if (!t.contains("lambdafunction")) println("[node] " + t)
        }
      }
    }
    spark.stop()
  }
}

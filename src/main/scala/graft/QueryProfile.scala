package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness (not part of the library surface): runs one
  * named SparkEntry query with job/stage timing listeners, for chasing
  * scale hot spots found by [[ScaleProbe]]. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pipeline_omics_e2e")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - starts.remove(je.jobId)) / 1e9}%7.3f s")
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        if (secs > 0.2)
          println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%-4d $secs%7.3f s  ${i.name.take(140)}")
      }
    })

    spark.range(10).count() // warm
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[total] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

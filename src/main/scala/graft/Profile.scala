package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage profiler (diagnostic main, not part of the bench
  * contract): runs each named query once warm, then once measured with a
  * listener that records every Spark job's wall duration, stage count,
  * task count, summed task time and shuffle bytes. The output answers the
  * two questions that decide where optimization effort goes:
  * how much of a query's wall time is DRIVER ROUND-TRIPS (many small
  * jobs = serial latency, the omics r7 lesson) vs EXECUTOR WORK (one big
  * job = look at the plan, not the orchestration).
  *
  * Usage: SPARK_GRAFT_ONLY=q1_agg,acgh_facts sbt "runMain graft.Profile"
  */
object Profile {
  private case class JobRec(jobId: Int, var stages: Int = 0, var tasks: Int = 0,
                            var taskTimeMs: Long = 0L, var cpuMs: Long = 0L,
                            var gcMs: Long = 0L, var shuffleReadB: Long = 0L,
                            var shuffleWriteB: Long = 0L,
                            var startMs: Long = 0L, var endMs: Long = 0L)

  private class Recorder extends SparkListener {
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]()
    private val stageToJob = new scala.collection.concurrent.TrieMap[Int, Int]()
    @volatile var enabled = false
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val r = JobRec(e.jobId); r.startMs = e.time
      jobs.put(e.jobId, r)
      e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.endMs = e.time)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      for (jid <- stageToJob.get(si.stageId); r <- jobs.get(jid)) {
        r.stages += 1
        r.tasks += si.numTasks
        r.taskTimeMs += si.taskMetrics.executorRunTime
        r.cpuMs += si.taskMetrics.executorCpuTime / 1000000L
        r.gcMs += si.taskMetrics.jvmGCTime
        r.shuffleReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        r.shuffleWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // diagnostic: exclude optimizer rules to attribute planning cost
    val spark = sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .fold(builder)(r => builder.config("spark.sql.optimizer.excludedRules", r))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rec = new Recorder
    spark.sparkContext.addSparkListener(rec)

    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    // SPARK_GRAFT_EXPLAIN=1: print each query's formatted physical plan
    // instead of executing it
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_.nonEmpty)) {
      names.foreach { name =>
        println(s"==== $name")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }
    // SPARK_GRAFT_PHASES=1: time the Catalyst phases (analysis/
    // optimization/planning) per query instead of executing
    if (sys.env.get("SPARK_GRAFT_PHASES").exists(_.nonEmpty)) {
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t0 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+plan
        val total = (System.nanoTime() - t0) / 1e9
        val phases = df.queryExecution.tracker.phases
          .map { case (p, s) => f"$p=${(s.endTimeMs - s.startTimeMs) / 1000.0}%.3fs" }
          .mkString(" ")
        println(f"== $name%-28s driverPlan=$total%.3fs  $phases")
        df.queryExecution.tracker.topRulesByTime(8).foreach { case (rule, summary) =>
          println(f"   ${summary.totalTimeNs / 1e9}%7.3fs x${summary.numInvocations}%-5d $rule")
        }
      }
      spark.stop()
      return
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      run() // warm: JIT + footer caches, like the bench's sampled min
      spark.catalog.clearCache(); System.gc()
      rec.jobs.clear(); rec.enabled = true
      val t0 = System.nanoTime()
      run()
      val wallMs = (System.nanoTime() - t0) / 1e6
      rec.enabled = false
      val js = rec.jobs.values.toSeq.sortBy(_.jobId)
      val jobWall = js.map(j => j.endMs - j.startMs).sum
      println(f"== $name%-28s wall=${wallMs / 1000}%.3fs jobs=${js.size}%d " +
        f"jobWallSum=${jobWall / 1000.0}%.3fs gapToWall=${(wallMs - jobWall) / 1000.0}%.3fs")
      js.foreach { j =>
        println(f"   job ${j.jobId}%4d ${(j.endMs - j.startMs) / 1000.0}%7.3fs " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskTimeMs / 1000.0}%8.3fs " +
          f"cpu=${j.cpuMs / 1000.0}%7.3fs gc=${j.gcMs / 1000.0}%6.3fs " +
          f"shRead=${j.shuffleReadB / 1024}%8dKB shWrite=${j.shuffleWriteB / 1024}%8dKB")
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

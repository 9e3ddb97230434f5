package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not part of the bench contract): dumps
  * `explain("formatted")` for the named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after evidence files
  * the optimization rounds commit.
  *
  * Usage: SPARK_GRAFT_ONLY=q1,q2 sbt "runMain graft.PlanDump r16 after"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("r16")
    val suffix = args.lift(1).getOrElse("after")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get(s"/root/repo/plans/$tag")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // run once so the AQE final plan (the shape that actually executed)
      // is what lands in the file
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $name -> plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: rows, nulls, exact distincts, byte-order range — one scan") {
    val df = Seq(
      (1, Option("b"), Option(2.5)),
      (2, Option.empty[String], Option(1.0)),
      (3, Option("a"), Option.empty[Double]),
      (4, Option("a"), Option(2.5))).toDF("id", "s", "d")
    val p = Profile.columnProfile(df, Seq("s", "d"))
      .orderBy("attribute")
      .as[(String, Long, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(p == Seq(
      ("d", 4L, 3L, 1L, 2L, "1.0", "2.5"),
      ("s", 4L, 3L, 1L, 2L, "a", "b")))
  }

  test("profile stays one scan: a single file read feeds the melt") {
    val dir = "/root/testdata/sf0.001"
    val prof = graft.queries.Relational.profileColumns(
      graft.SparkTestSession.spark, dir)
    prof.collect()
    val plan = prof.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      s"profiler must melt in one scan:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window ["))
  }
}

package graft

/** Plan audit (not a correctness test): prints formatted plans of the
  * round-2 heavyweight queries so shuffle/broadcast shape can be reviewed. */
class PlanAuditSpec extends SparkSpec {
  test("print plans for round-2 queries") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("load_samples_mapping", "annotation_registry",
        "merge_append", "pipeline_omics_e2e")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      println(s"=== $name: exchanges=${ex - bc} broadcasts=$bc cartesian=${plan.contains("Cartesian")}")
      assert(!plan.contains("CartesianProduct"),
        s"$name grew an accidental cartesian product")
    }
  }
}

package graft.pipeline

import graft.SparkSpec

/** Pins the work-table shape of the clinical pipeline: the cleansed EAV
  * frame fans out to aggregate+join-back pairs (single-visit counts, type
  * inference), and Catalyst expands every reference to an UNcached frame
  * into a full plan copy — the file explode+cleanse subtree ran 4x before
  * the cache() point in ClinicalPipeline.run. The InMemoryRelation keeps
  * plan statistics (a localCheckpoint barrier hides them and degraded the
  * tiny join-backs to sort-merge joins) and the BlockManager's partition
  * locking dedupes computation under AQE's concurrent stage submission. */
class ClinicalPlanSpec extends SparkSpec {
  test("clinical e2e: fan-out consumers read the cached work table") {
    val df = graft.SparkEntry.queries("pipeline_clinical_e2e")(
      spark, "/root/testdata/sf0.001")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val mem = "InMemoryTableScan".r.findAllIn(plan).length
    assert(mem >= 2,
      s"expected the EAV fan-out to read the cached work table " +
        s"(>=2 InMemoryTableScan), found $mem:\n${plan.take(3000)}")
    spark.catalog.clearCache()
  }
}

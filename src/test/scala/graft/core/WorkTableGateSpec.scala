package graft.core

import graft.SparkSpec

/** Pins the r16 size gate on the multi-consumer corpus work-tables
  * (guide §5): the lazy localCheckpoint in sample_weighted /
  * text_bigram_lm must engage ONLY in the small-input regime
  * ([[Tables.smallInput]] — fewer scan splits than slots). Above the
  * gate the plain recompute shape returns: at 100 TB a corpus-sized
  * materialization to executor storage is a full corpus copy and an
  * executor-loss recompute hazard, while the scan itself already
  * parallelizes the recompute. The regimes are simulated by flipping
  * `spark.sql.files.maxPartitionBytes`, the same knob the gate's split
  * arithmetic uses.
  */
class WorkTableGateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val confKey = "spark.sql.files.maxPartitionBytes"

  private def withMaxPartitionBytes[A](v: String)(body: => A): A = {
    val old = spark.conf.get(confKey)
    spark.conf.set(confKey, v)
    try body finally spark.conf.set(confKey, old)
  }

  test("smallInput flips with the scan split count") {
    withMaxPartitionBytes((512L * 1024 * 1024).toString) {
      assert(Tables.smallInput(spark, dir, "documents"),
        "a one-split scan on local[2] must be the small-input regime")
    }
    withMaxPartitionBytes("4096") {
      assert(!Tables.smallInput(spark, dir, "documents"),
        "many splits >= slots must be the at-scale regime")
    }
  }

  test("corpus work-table engages only in the small-input regime") {
    // other, BOUNDED checkpoints (model count frames, race histograms)
    // legitimately stay in both regimes, so the pin is on the COUNTS:
    // above the gate the corpus checkpoint disappears (one fewer
    // ExistingRDD scan) and the corpus parquet scan reappears once per
    // consumer (more parquet scans)
    def counts(plan: String): (Int, Int) =
      ("Scan ExistingRDD".r.findAllIn(plan).length,
        "Scan parquet".r.findAllIn(plan).length)
    // text_bigram_lm only: sample_weighted's final plan starts at the
    // race-pass checkpoint inside weightedSample, which hides the whole
    // upstream lineage (corpus checkpoint included) from the plan string;
    // both queries share the same docsWorkTable helper, and the
    // identical-rows test below covers both end-to-end.
    for (name <- Seq("text_bigram_lm")) {
      val (smallRdd, smallPq) =
        counts(withMaxPartitionBytes((512L * 1024 * 1024).toString) {
          graft.SparkEntry.queries(name)(spark, dir)
            .queryExecution.executedPlan.toString
        })
      val (bigRdd, bigPq) = counts(withMaxPartitionBytes("4096") {
        graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
      })
      // the checkpoint scan appears once PER CONSUMER in the plan tree,
      // so above the gate the ExistingRDD count drops by >= 1
      assert(bigRdd < smallRdd,
        s"$name: the corpus checkpoint scans must be absent above the " +
          s"gate: $smallRdd -> $bigRdd")
      assert(bigPq > smallPq,
        s"$name: above the gate each consumer re-reads the corpus scan " +
          s"(parquet scans $smallPq -> $bigPq)")
    }
  }

  test("gated and ungated forms return identical rows") {
    for (name <- Seq("sample_weighted", "text_bigram_lm")) {
      val small = withMaxPartitionBytes((512L * 1024 * 1024).toString) {
        graft.SparkEntry.queries(name)(spark, dir)
      }
      val big = withMaxPartitionBytes("4096") {
        graft.SparkEntry.queries(name)(spark, dir)
      }
      assert(small.except(big).count() == 0 && big.except(small).count() == 0,
        s"$name: the gate must not change what the query computes")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed connected-components probe (not part of the library
  * surface).
  *
  * [[graft.operators.Dedup.clusters]] routes pair graphs under the counted
  * driver guard (5M edges) through driver-side union-find; the distributed
  * min-label fixpoint is the fallback for genuinely huge graphs — and
  * until this probe it had never run outside unit scale (the sf1 replica
  * corpus tops out under the guard). This main pushes a synthetic
  * 10M-edge / 11M-node graph through the distributed path directly:
  * 1M disjoint 11-node CHAINS, the adversarial shape for min-label
  * propagation (a label moves one hop per round, so diameter-10 chains
  * force ~11 rounds — a star graph would converge in 2 and prove nothing).
  *
  * Checks: exact fixpoint (every node labeled with its chain's minimum,
  * validated with one distributed comparison), round count = diameter + 1,
  * and FLAT per-round wall times — the per-round localCheckpoint claim
  * (without it the round plan references the previous round's frame three
  * times and the logical plan grows exponentially).
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val chains = sys.env.getOrElse("SPARK_GRAFT_CHAINS", "1000000").toLong
    // chain c owns node ids c*16 + 0..10; edges (v, v+1) along the chain.
    // 10 edges per chain => chains * 10 total edges, min member c*16.
    val edges = spark.range(chains * 10)
      .select(
        (expr("id div 10") * 16 + expr("id % 10")).as("doc_a"),
        (expr("id div 10") * 16 + expr("id % 10") + 1).as("doc_b"))
      .localCheckpoint(true)
    val nEdges = edges.count()
    println(s"[probe] $nEdges synthetic edges (${chains} chains of 11 nodes)")

    val t0 = System.nanoTime()
    val labels = operators.Dedup
      .clustersDistributedVerbose(edges, verbose = true)
    val nNodes = labels.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // exact fixpoint: every node's label is its chain's minimum (c*16)
    val wrong = labels
      .filter(col("cluster_id") =!= expr("(doc_id div 16) * 16")).count()
    println(f"[probe] nodes=$nNodes wrong_labels=$wrong wall=$wall%.1f s")
    assert(wrong == 0L, s"fixpoint not reached: $wrong mislabeled nodes")
    spark.stop()
  }
}

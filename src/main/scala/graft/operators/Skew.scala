package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join splitting handles most cases automatically (kept on in
  * every session); these helpers cover the two shapes AQE does not:
  * a count-distinct whose single hot key floods one reducer, and a
  * broadcast-unsafe join against a skewed key column.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from a second column (NOT
    * rand() — reruns and the oracle compare need stable results). */
  def salt(c: Column, buckets: Int): Column = pmod(hash(c), lit(buckets))

  /** Two-phase distinct count per key: phase 1 dedups (key, salt, entity)
    * with map-side combine across `buckets` reducers, phase 2 merges the
    * per-salt partial distincts. Same result as countDistinct, but the hot
    * key's work spreads over `buckets` tasks. */
  def saltedDistinctCount(df: DataFrame, keyCol: String, entityCol: String,
                          buckets: Int = 16): DataFrame =
    df.select(col(keyCol), col(entityCol),
        salt(col(entityCol), buckets).as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(countDistinct(col(entityCol)).as("partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("partial")).as("distinct_count"))
  // NOTE: correct because each entity value lands in exactly one salt
  // bucket (salt is a function of the entity), so partial distincts are
  // disjoint and sum to the true distinct count.

  /** Salted join for a skewed fact key against a small-but-not-broadcastable
    * dim: fact rows get a deterministic salt, the dim is replicated once
    * per bucket, and the join key becomes (key, salt) — the hot key's rows
    * spread over `buckets` reducers.
    *
    * The salt hashes the key together with the caller-named `spreadCols`
    * (payload columns that vary within the hot key) — deterministic, so
    * the partition layout reproduces run to run; join RESULTS never depend
    * on the salt either way, but a reproducible layout is what makes perf
    * runs comparable. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 spreadCols: Seq[String], buckets: Int = 16): DataFrame = {
    require(spreadCols.nonEmpty,
      "spreadCols must name at least one fact column that varies within the hot key")
    val saltedFact = fact.withColumn("_salt",
      pmod(hash((key +: spreadCols).map(col): _*), lit(buckets)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}

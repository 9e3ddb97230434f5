package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via binning — the equi-join formulation
  * of `p.key = i.key AND p.pos BETWEEN i.lo AND i.hi` (variant-in-region,
  * event-in-window, price-in-bracket).
  *
  * Why not write the predicate directly: Spark plans a non-equi
  * condition as BroadcastNestedLoopJoin (or a per-key cartesian) — every
  * point is checked against every interval of its key, quadratic under
  * hot keys. Binning restores a plain shuffled equi-join: each interval
  * explodes into the O(span/binWidth) bins it covers, each point carries
  * its single bin, the join runs on (keys..., bin) — shuffle once,
  * hash-join, AQE skew-splittable — and the exact BETWEEN filter runs on
  * the already-bin-matched residue. A (point, interval) pair co-occurs
  * in exactly one bin (the point's), so no dedup pass is needed.
  *
  * Pick `binWidth` near the typical interval span: the interval explode
  * stays O(few) rows per interval while bins stay selective. A corrupt
  * interval spanning the whole domain would explode domain/binWidth
  * rows — bound it upstream (the reader fuzz discipline nulls malformed
  * coordinates, and `lo <= hi` is enforced here by filter). */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointCol: String,
                      loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pb = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    pb.join(ib, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}

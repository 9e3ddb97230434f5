package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
  * Bins are EXACT integer division (`div`, truncation toward zero —
  * matched by DuckDB's `//`), never `floor(col / width)`: IEEE double
  * division rounds above 2^53, so an epoch-nanos point and its
  * interval's endpoints could each round a bin off by one and a
  * BETWEEN-satisfying pair would silently miss the equi-join. Truncation
  * (vs floor) only shifts bin ALIGNMENT around zero; correctness needs
  * monotonicity, which truncation preserves. Coordinate columns must be
  * integral for the same reason (enforced).
  *
  * `binWidth` defaults to the intervals' median span (one cheap
  * aggregate): the explode stays O(1) rows per typical interval while
  * bins stay selective. A corrupt interval spanning far more than
  * `maxBinsPerInterval` bins (the whole-domain degenerate) raises a
  * named error instead of exploding domain/binWidth rows. */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointCol: String,
                      loCol: String, hiCol: String,
                      binWidth: Option[Long] = None,
                      maxBinsPerInterval: Long = 4096L): DataFrame = {
    Seq(points -> pointCol, intervals -> loCol, intervals -> hiCol).foreach {
      case (df, c) =>
        val dt = df.schema(c).dataType
        require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
          s"range join coordinates must be integral (exact bins); `$c` is $dt")
    }
    val valid = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
    val w = binWidth.getOrElse(derivedWidth(valid, loCol, hiCol))
    require(w > 0, s"binWidth must be positive, got $w")
    val loBin = expr(s"`$loCol` div ${w}L")
    val hiBin = expr(s"`$hiCol` div ${w}L")
    // the guard lives INSIDE the sequence bound so column pruning can
    // never drop it: a too-wide interval errors by name, it does not
    // silently explode (or silently truncate) its bin range
    val hiGuarded = when(hiBin - loBin < lit(maxBinsPerInterval), hiBin)
      .otherwise(raise_error(concat(
        lit(s"range join: interval spans >= $maxBinsPerInterval bins at " +
          s"binWidth=$w (corrupt whole-domain interval?): lo="),
        col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string")))
        .cast("long"))
    val pb = points.withColumn("__bin", expr(s"`$pointCol` div ${w}L"))
    val ib = valid.withColumn("__bin", explode(sequence(loBin, hiGuarded)))
    pb.join(ib, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join — the interval x interval companion of
    * [[pointInInterval]]: `a.key = b.key AND a.lo <= b.hi AND
    * b.lo <= a.hi` (region-overlap of variants/annotations, meeting
    * conflicts, session intersections) as a binned equi-join.
    *
    * Both sides explode into their covered bins and join on
    * (keys..., bin); because an overlapping pair co-occurs in EVERY
    * shared bin, each pair is kept only in its OWNERSHIP bin — the bin
    * of `greatest(a.lo, b.lo)`, the overlap's start, which both sides
    * provably cover — so the result has each pair exactly once with no
    * distinct pass. Left/right column name collisions are rejected
    * (prefix upstream); the width/guard semantics are
    * [[pointInInterval]]'s, with the default width derived from the
    * LEFT side's median span. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String],
                      leftLo: String, leftHi: String,
                      rightLo: String, rightHi: String,
                      binWidth: Option[Long] = None,
                      maxBinsPerInterval: Long = 4096L): DataFrame = {
    Seq(left -> leftLo, left -> leftHi, right -> rightLo, right -> rightHi)
      .foreach { case (df, c) =>
        val dt = df.schema(c).dataType
        require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
          s"range join coordinates must be integral (exact bins); `$c` is $dt")
      }
    val dup = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(dup.isEmpty,
      s"intervalOverlap: non-key columns collide (${dup.mkString(", ")}); " +
        "rename/prefix one side")
    def valid(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
    val lv = valid(left, leftLo, leftHi)
    val w = binWidth.getOrElse(derivedWidth(lv, leftLo, leftHi))
    require(w > 0, s"binWidth must be positive, got $w")
    def binned(df: DataFrame, lo: String, hi: String) = {
      val loBin = expr(s"`$lo` div ${w}L")
      val hiBin = expr(s"`$hi` div ${w}L")
      val hiGuarded = when(hiBin - loBin < lit(maxBinsPerInterval), hiBin)
        .otherwise(raise_error(concat(
          lit(s"range join: interval spans >= $maxBinsPerInterval bins at " +
            s"binWidth=$w (corrupt whole-domain interval?): lo="),
          col(lo).cast("string"), lit(" hi="), col(hi).cast("string")))
          .cast("long"))
      df.withColumn("__bin", explode(sequence(loBin, hiGuarded)))
    }
    binned(lv, leftLo, leftHi)
      .join(binned(valid(right, rightLo, rightHi), rightLo, rightHi),
        keyCols :+ "__bin")
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi) &&
        col("__bin") === expr(s"greatest(`$leftLo`, `$rightLo`) div ${w}L"))
      .drop("__bin")
  }

  /** Median interval span + 1 from one aggregate over the (already
    * filtered) intervals — the width the scaladoc's O(1)-bins-per-interval
    * reasoning wants. Only performance depends on the estimate, never the
    * result set, so `approx_percentile` is fine here. */
  private def derivedWidth(valid: DataFrame, loCol: String,
                           hiCol: String): Long = {
    val row = valid
      .agg(expr(s"approx_percentile(cast(`$hiCol` - `$loCol` + 1 as bigint), 0.5)")
        .as("m"))
      .collect().head
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }
}

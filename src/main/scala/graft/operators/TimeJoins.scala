package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins Spark lacks as built-ins, composed from union +
  * carry-forward-window passes rather than per-row range probes.
  *
  * 100 TB shape: both sides union into ONE frame tagged by side, shuffle
  * ONCE, and a partitioned window (never global) carries the latest right
  * payload forward; the match for every left row falls out of the same
  * sorted pass. Contrast the naive left-join-then-filter-then-argmax,
  * which shuffles twice and materializes every (left, candidate) pair —
  * quadratic under hot keys.
  *
  * Skew: a `Window.partitionBy(key)` makes each key ONE window partition,
  * and unlike a skewed join AQE can never split a window partition — at
  * web/tick scale one hot key (a popular instrument, user, or null-ish
  * key holding 10% of the data) is an unsplittable sorted straggler.
  * `chunkWidth` turns the carry-forward into the two-pass TIME-CHUNKED
  * form: the big window partitions by (key, `ts div chunkWidth`), so a
  * hot key spreads over its time chunks, and each chunk's carried-in
  * value arrives as a synthetic first-of-chunk row derived from a tiny
  * per-(key, chunk) boundary frame — no join operator, no per-key window
  * over anything bigger than the chunk list. Pick the width so a chunk of
  * the hottest key fits one task comfortably (e.g. an hour of the
  * hottest instrument's ticks) — results are IDENTICAL for any width.
  */
object TimeJoins {

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `rightTs` <= `leftTs` within the same key (the
    * match-most-recent join of event/tick processing). Unmatched left
    * rows keep null right columns.
    *
    * Determinism: equal-timestamp right rows resolve by the right
    * payload's remaining columns in order (the first tiebreak column is
    * whatever follows `rightTs` in `right`), so reruns, repartitions,
    * any `chunkWidth` and the DuckDB oracle agree exactly. A right row
    * AT the left timestamp matches (<=, the standard as-of contract).
    *
    * Timestamp columns must be integral (epoch nanos for the events
    * table) or TIMESTAMP (ordered/chunked/guarded via exact
    * `unix_micros`); floats are rejected — above 2^53 a double tick
    * cannot even represent adjacent nanos.
    *
    * @param tolerance  max allowed `leftTs - rightTs` (ts units for
    *                   integral ts columns, MICROSECONDS for timestamp
    *                   columns); older matches null out.
    * @param chunkWidth time-chunk width in the same units as `tolerance`
    *                   for the skew-proof two-pass form; None keeps the
    *                   single per-key window (fine when no key can
    *                   dominate a task — small key cardinality bounds,
    *                   dimension-sized rights). Integer `div` chunking is
    *                   exact at any long magnitude (no float floor) and
    *                   truncation-toward-zero only shifts alignment at
    *                   zero, never ordering. */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   tolerance: Option[Long] = None,
                   rightPrefix: String = "asof_",
                   chunkWidth: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofBackward needs at least one key column")
    chunkWidth.foreach(w => require(w > 0, s"chunkWidth must be positive: $w"))
    val rCols = right.columns.filterNot(keyCols.contains).toSeq
    val lCols = left.columns.filterNot(keyCols.contains).toSeq
    val rOrdered = rCols.filterNot(_ == rightTs)
    def tsNum(c: Column, dt: DataType, name: String): Column = dt match {
      case TimestampType => unix_micros(c)
      case ByteType | ShortType | IntegerType | LongType => c.cast("long")
      case other => throw new IllegalArgumentException(
        s"as-of timestamp column `$name` must be integral or TIMESTAMP, got $other")
    }
    // right payload rides ONE struct: ts first, then the remaining right
    // columns — the struct compare IS the deterministic tie order
    val rStruct = struct((col(rightTs) +: rOrdered.map(col)): _*)
    val rSide = right.select(keyCols.map(col) ++ Seq(
      tsNum(col(rightTs), right.schema(rightTs).dataType, rightTs).as("__tsn"),
      lit(0).as("__side"), rStruct.as("__r")): _*)
    val lSide = left.select(keyCols.map(col) ++ Seq(
      tsNum(col(leftTs), left.schema(leftTs).dataType, leftTs).as("__tsn"),
      lit(1).as("__side"),
      lit(null).cast(rSide.schema("__r").dataType).as("__r"),
      struct(lCols.map(col): _*).as("__l")): _*)
    val lStructType = lSide.schema("__l").dataType
    val unioned = rSide
      .withColumn("__l", lit(null).cast(lStructType))
      .unionByName(lSide)

    // right rows sort BEFORE left rows at the same timestamp (side 0 < 1)
    // so an equal-ts right row is visible to the left row's carry-forward
    val (win, framed) = chunkWidth match {
      case None =>
        (Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__tsn"), col("__side"), col("__r")),
          unioned)
      case Some(w) =>
        val chunk = expr(s"__tsn div ${w}L")
        // pass 1, ONE map-side-combinable aggregate over the union: per
        // (key, chunk), the chunk's LAST right payload is max(__r) — the
        // struct compare is exactly the window's tie order with ts
        // leading, and left rows carry null __r, so the same aggregate
        // also enumerates left-only chunks (max -> null). Re-computing
        // the union here duplicates only pushed-down-cheap SCANS, never
        // a shuffle — the agg ships (key, chunk) partials.
        // pass 2, tiny frame (one row per key x chunk): each chunk's
        // carried-in value = the last boundary payload of any EARLIER
        // chunk. The only per-key window in the plan runs over this
        // chunk list, bounded by time-range/chunkWidth, never by data.
        val carryW = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val synth = unioned.withColumn("__chunk", chunk)
          .groupBy((keyCols :+ "__chunk").map(col): _*)
          .agg(max(col("__r")).as("__last"))
          .withColumn("__cin", last(col("__last"), ignoreNulls = true).over(carryW))
          .filter(col("__cin").isNotNull)
          .select(keyCols.map(col) ++ Seq(
            lit(null).cast("long").as("__tsn"), lit(-1).as("__side"),
            col("__cin").as("__r"), lit(null).cast(lStructType).as("__l"),
            col("__chunk")): _*)
        // synthetic carry rows sort first IN THEIR CHUNK via the priority
        // term (their payload ts belongs to an earlier chunk, so ts-order
        // alone could not place them), then the chunk-local pass is the
        // ordinary carry-forward. Union, not join: no join operator, the
        // one big shuffle is the (key, chunk) window partitioning.
        (Window.partitionBy((keyCols :+ "__chunk").map(col): _*)
          .orderBy(when(col("__side") === -1, 0).otherwise(1),
            col("__tsn"), col("__side"), col("__r")),
          unioned.withColumn("__chunk", chunk).unionByName(synth))
    }

    val guarded = tolerance.fold(col("__m"))(tol =>
      when(col("__m").isNotNull &&
        col("__tsn") - tsNum(col("__m").getField(rightTs),
          right.schema(rightTs).dataType, rightTs) <= tol, col("__m")))
    framed
      .withColumn("__m", last(col("__r"), ignoreNulls = true)
        .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__side") === 1)
      .withColumn("__m", guarded)
      .select(keyCols.map(col) ++
        lCols.map(c => col("__l").getField(c).as(c)) ++
        (rightTs +: rOrdered).map(c =>
          col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Forward as-of join: for each left row, the single right row with the
    * smallest `rightTs` >= `leftTs` within the same key (match-NEXT — the
    * time-to-event / next-fill lookup). Implemented as [[asofBackward]]
    * over NEGATED timestamps, so it inherits the whole machinery: the
    * union+carry-forward shape, determinism, `tolerance` (here the max
    * allowed `rightTs - leftTs`) and the skew-proof `chunkWidth` form.
    * Equal-timestamp right rows resolve to the GREATEST remaining right
    * payload, the same tie rule as backward. Timestamp columns must be
    * integral (epoch nanos/micros/millis — negation of a TIMESTAMP type
    * is not defined; convert first). Unmatched left rows keep null right
    * columns. */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String,
                  tolerance: Option[Long] = None,
                  rightPrefix: String = "asof_",
                  chunkWidth: Option[Long] = None): DataFrame = {
    Seq(left.schema(leftTs).dataType, right.schema(rightTs).dataType)
      .foreach(dt => require(
        Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"asofForward needs integral timestamps (got $dt); negate-able"))
    val out = asofBackward(
      left.withColumn(leftTs, -col(leftTs).cast("long")),
      right.withColumn(rightTs, -col(rightTs).cast("long")),
      keyCols, leftTs, rightTs, tolerance, rightPrefix, chunkWidth)
    out
      .withColumn(leftTs, -col(leftTs))
      .withColumn(rightPrefix + rightTs, -col(rightPrefix + rightTs))
  }

  /** Nearest as-of join: for each left row, the right row with the
    * smallest |rightTs - leftTs| within the same key (sensor/tick
    * alignment); equal gaps resolve to the AT-OR-BEFORE match. Composed
    * as the backward pass feeding the forward pass — the backward
    * output is exactly one row per left row, so its match columns ride
    * along as ordinary left payload through the forward pass and the
    * closer candidate is a projection at the end: NO join of the two
    * result sets, two shuffles total (one per direction, each
    * skew-proofable via `chunkWidth`).
    *
    * Output adds `rightPrefix + c` for each right column plus
    * `rightPrefix + "from"` ("before" | "after" | null) naming the
    * winning direction. `tolerance` bounds the winning |gap|.
    * Integral timestamps only (the forward leg negates). */
  def asofNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String,
                  tolerance: Option[Long] = None,
                  rightPrefix: String = "asof_",
                  chunkWidth: Option[Long] = None): DataFrame = {
    val rCols = right.columns.filterNot(keyCols.contains).toSeq
    val rOut = rightTs +: rCols.filterNot(_ == rightTs)
    val b = asofBackward(left, right, keyCols, leftTs, rightTs,
      tolerance = None, rightPrefix = "__b_", chunkWidth = chunkWidth)
    val both = asofForward(b, right, keyCols, leftTs, rightTs,
      tolerance = None, rightPrefix = "__f_", chunkWidth = chunkWidth)
    val gapB = col(leftTs).cast("long") - col("__b_" + rightTs)
    val gapF = col("__f_" + rightTs) - col(leftTs).cast("long")
    val pickB = col("__b_" + rightTs).isNotNull &&
      (col("__f_" + rightTs).isNull || gapB <= gapF)
    val gap = when(pickB, gapB).otherwise(gapF)
    val inTol = tolerance.fold(lit(true))(t => gap <= t)
    val keep = keyCols ++ left.columns.filterNot(keyCols.contains)
    val matched = col("__b_" + rightTs).isNotNull ||
      col("__f_" + rightTs).isNotNull
    both.select(keep.map(col) ++
      rOut.map(c => when(inTol,
        when(pickB, col("__b_" + c)).otherwise(col("__f_" + c)))
        .as(rightPrefix + c)) :+
      when(inTol && matched, when(pickB, "before").otherwise("after"))
        .as(rightPrefix + "from"): _*)
  }
}

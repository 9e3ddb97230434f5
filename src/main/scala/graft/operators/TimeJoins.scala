package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from one
  * shuffle+sort each — the union + carry-forward-window formulation
  * rather than a per-row range probe.
  *
  * 100 TB shape: both sides union into ONE frame tagged by side, shuffle
  * ONCE on the join key, and a key-partitioned window (never global)
  * carries the latest right payload forward; the match for every left
  * row falls out of the same sorted pass. Contrast the naive
  * left-join-then-filter-then-argmax, which shuffles twice and
  * materializes every (left, candidate) pair — quadratic under hot keys.
  */
object TimeJoins {

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `rightTs` <= `leftTs` within the same key (the
    * match-most-recent join of event/tick processing). Unmatched left
    * rows keep null right columns.
    *
    * Determinism: equal-timestamp right rows resolve by the right
    * payload's remaining columns in order (the first tiebreak column is
    * whatever follows `rightTs` in `right`), so reruns, repartitions and
    * the DuckDB oracle agree exactly. A right row AT the left timestamp
    * matches (<=, the standard as-of contract).
    *
    * @param tolerance max allowed `leftTs - rightTs` (same units as the
    *                  ts columns — epoch nanos for the events table);
    *                  older matches null out. */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   tolerance: Option[Long] = None,
                   rightPrefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "asofBackward needs at least one key column")
    val rCols = right.columns.filterNot(keyCols.contains).toSeq
    val lCols = left.columns.filterNot(keyCols.contains).toSeq
    val rOrdered = rCols.filterNot(_ == rightTs)
    // right payload rides ONE struct: ts first, then the remaining right
    // columns — the struct compare IS the deterministic tie order
    val rStruct = struct((col(rightTs) +: rOrdered.map(col)): _*)
    val rSide = right.select(keyCols.map(col) ++ Seq(
      col(rightTs).as("__ts"), lit(0).as("__side"), rStruct.as("__r")): _*)
    val lSide = left.select(keyCols.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rSide.schema("__r").dataType).as("__r"),
      struct(lCols.map(col): _*).as("__l")): _*)
    val unioned = rSide
      .withColumn("__l", lit(null).cast(lSide.schema("__l").dataType))
      .unionByName(lSide)
    // right rows sort BEFORE left rows at the same timestamp (side 0 < 1)
    // so an equal-ts right row is visible to the left row's carry-forward
    val win = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val guarded = tolerance.fold(col("__m"))(tol =>
      when(col("__m").isNotNull &&
        col("__ts") - col("__m").getField(rightTs) <= tol, col("__m")))
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(win))
      .filter(col("__side") === 1)
      .withColumn("__m", guarded)
      .select(keyCols.map(col) ++
        lCols.map(c => col("__l").getField(c).as(c)) ++
        (rightTs +: rOrdered).map(c =>
          col("__m").getField(c).as(rightPrefix + c)): _*)
  }
}

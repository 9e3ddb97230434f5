package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a pipeline runs before
  * trusting a new drop: per column, row/null/distinct counts and the
  * value range, in ONE scan of the table.
  *
  * Shape: each row melts into (attribute, value-as-string) structs via
  * one `explode` (a pure projection), then one groupBy on the attribute
  * — a bounded-cardinality shuffle (one group per profiled column).
  * Count/min/max aggregate map-side; the exact distinct expands into
  * Spark's standard two-phase distinct aggregate, still keyed by the
  * same bounded attribute domain. No per-column scans, no collect.
  *
  * min/max compare the STRING rendering (Spark's UTF8String ordering is
  * byte-wise, matching engines with binary collation); numeric columns
  * wanting numeric ranges should be profiled through a numeric cast
  * upstream. */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val entries = array(cols.map { c =>
      struct(lit(c).as("attribute"), col(c).cast("string").as("value"))
    }: _*)
    df.select(explode(entries).as("e"))
      .select(col("e.attribute").as("attribute"), col("e.value").as("value"))
      .groupBy(col("attribute"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_values"),
        (count(lit(1)) - count(col("value"))).as("n_nulls"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
  }
}

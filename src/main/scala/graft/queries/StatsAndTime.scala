package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.operators.ZScore
import graft.functions.{StatAggregators, TimeFunctions}

/** Statistics, scalar-function and windowed-analytics coverage:
  * A2/A7/A10/A12, J10, the timepoint scalar, JSON extraction, and a
  * sessionization window (streaming-analog batch form).
  */
object StatsAndTime {

  // Plain load throughout: the z-score pipeline is now a single window
  // pass whose first operator is a shuffle on the group key, so a
  // pre-repartition would only add an exchange (same for the aggregates).
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** A7: the shared omics z-score pipeline (log2 -> per-group
    * avg/median/stddev -> clamped z-score) on lineitem prices per part. */
  def a7Zscore(s: SparkSession, dir: String): DataFrame =
    ZScore.pipeline(
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice")),
      groupCols = Seq("l_partkey"), valueCol = "l_extendedprice",
      dataType = "R", logBase = 2.0)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        round(col("raw_intensity"), 2).as("raw_intensity"),
        round(col("log_intensity"), 6).as("log_intensity"),
        round(col("zscore"), 4).as("zscore"))

  /** A10: per-variable summary statistics incl. exact median and Tukey
    * hinges (custom Aggregator — Spark's interpolated percentile cannot
    * express the hinge rule). */
  def a10SummaryStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_values"),
        round(avg(col("value")), 4).as("mean"),
        round(stddev_samp(col("value")), 4).as("stddev"),
        round(min(col("value")), 2).as("min"),
        round(max(col("value")), 2).as("max"),
        StatAggregators.tukeyHinges(col("value")).as("h"))
      .select(col("event_type"), col("n_values"), col("mean"), col("stddev"),
        col("min"), col("max"),
        round(col("h.median"), 2).as("median"),
        round(col("h.lower_hinge"), 2).as("lower_hinge"),
        round(col("h.upper_hinge"), 2).as("upper_hinge"),
        round(col("h.upper_hinge") - col("h.lower_hinge"), 2).as("iqr"))

  /** A2: single-group guard shape (study-id count). */
  def a2GroupGuard(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy(col("source")).agg(count(lit(1)).as("n_docs"))

  /** A12: existence-count guard (multi-platform-per-sample analog:
    * suppliers shipping more than one brand). */
  def a12ExistenceGuards(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = broadcast(t(s, dir, "part"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("p_brand")).as("n_brands"))
      .filter(col("n_brands") > 1)
      .agg(count(lit(1)).as("violations"))
  }

  /** J10: regex-predicate join (UPDATE_VARIABLES path matching,
    * I2B2_LOAD_CLINICAL_DATA.sql:1168-1282) — patterns x paths via
    * broadcast + rlike, counts validated per pattern. */
  def j10RegexJoin(s: SparkSession, dir: String): DataFrame = {
    val paths = TreeAndEav.fnPathScalars(s, dir).select(col("path"))
    val patterns = t(s, dir, "region")
      .select(concat(lit("^\\\\"), col("r_name"), lit("\\\\.*")).as("pattern"))
    paths.crossJoin(broadcast(patterns))
      .filter(expr("path rlike pattern"))
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** §2.9 timepoint scalar: per-user baseline diff rendered as the
    * reference's 'D days H hours M minutes S seconds' label. */
  def fnTimepoint(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val base = e.groupBy(col("user_id")).agg(min(col("ts")).as("baseline_ns"))
    e.join(base, "user_id")
      .select(col("event_id"),
        TimeFunctions.timepointLabel(
          expr("(ts - baseline_ns) DIV 1000000000")).as("timepoint"))
  }

  /** §2.9 JSON extraction (metadata-ish props parsing). */
  def fnJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_count"))

  /** W3: sessionization — gap>30min starts a new session (windowed
    * analytics over the event stream, batch form). */
  def w3Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapNs = 30L * 60 * 1000000000L
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        (col("ts") - col("prev_ts")) > gapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** As-of join: every click matched to the user's most recent view at
    * or before it ([[graft.operators.TimeJoins.asofBackward]]) — one
    * union + one key shuffle + one per-user window, no range probe. */
  def asofClickView(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    graft.operators.TimeJoins.asofBackward(
      left = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id")),
      right = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      rightPrefix = "view_",
      // day-wide time chunks (ts is epoch nanos): the skew-proof two-pass
      // carry-forward — a hot user splits across ~30 window partitions
      // here instead of one; results identical for any width
      chunkWidth = Some(86400L * 1000000000L))
  }

  /** Forward as-of: each click matched to the NEXT view within 3 days —
    * the time-to-event lookup, exercising the tolerance path through the
    * oracle gate; chunked like its backward twin. */
  def asofNextView(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    graft.operators.TimeJoins.asofForward(
      left = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id")),
      right = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      tolerance = Some(3L * 86400L * 1000000000L),
      rightPrefix = "view_",
      chunkWidth = Some(86400L * 1000000000L))
  }

  /** Nearest as-of: each click aligned to its closest view in either
    * direction (gap ties resolve to at-or-before); chunked both legs. */
  def asofNearestView(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    graft.operators.TimeJoins.asofNearest(
      left = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id")),
      right = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      rightPrefix = "view_",
      chunkWidth = Some(86400L * 1000000000L))
  }
}

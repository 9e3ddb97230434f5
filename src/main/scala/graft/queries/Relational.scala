package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator coverage (SURVEY §2.2-2.8) expressed over the
  * driver's TPC-H-ish tables. Each query has a DuckDB oracle twin in
  * [[graft.queries.Oracles]]; column names/aliases match exactly.
  *
  * Determinism conventions (oracle hash-compare):
  *  - every floating-point output passes through round(_, n)
  *  - no LIMIT without a total order; ties always broken by a key column
  */
object Relational {

  // Plain load: these plans are scan+aggregate/join shapes whose map side
  // is a cheap partial aggregate — a post-scan repartition costs more than
  // the decode parallelism it buys (measured r6: q1_agg 0.23->0.83 s).
  // Compute-heavy callers use Tables.loadParallel at their own read site.
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact order-independent money sum: the inputs are fixed-point (prices
    * and discounts carry <=2 dp, so products carry exactly 4 dp) — the true
    * value scaled by 10^4 IS an integer, and `round` recovers it exactly
    * (double error << 0.5 at these magnitudes). The long sum is then exact
    * regardless of partition order, and one division restores the scale.
    * Semantically identical to per-row decimal(18,4) quantization + decimal
    * sum, but primitive longs stay inside whole-stage codegen (measured 5x
    * on q1: 1.0 s decimal agg -> 0.2 s). Exactness bound: the long sum is
    * exact to 9.2e18 scaled units, but the final /10000.0 passes through
    * double, which is integer-exact only below 2^53 scaled units (~9e11
    * value units per group — still far past any per-group money total).
    * Beyond that the result stays deterministic (order-independent), but a
    * 2-dp rounding decision at a half-ulp boundary could diverge from a
    * true decimal sum. */
  private def sum4dp(c: Column): Column =
    // floor(x+0.5) == round-HALF_UP for the non-negative money values here,
    // and codegens to Math.floor instead of a per-row BigDecimal
    sum(floor(c * 10000 + 0.5).cast("long")) / 10000.0

  /** A1/A6-style pricing summary: groupBy + multi-agg (the TPC-H Q1 shape).
    * Map-side partial aggregation + single shuffle on the (tiny) group key. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        // scaled-long sums: deterministic at the 2-dp rounding boundary
        // (a raw double sum follows partition order); see sum4dp
        round(sum4dp($"l_quantity"), 2).as("sum_qty"),
        round(sum4dp($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum4dp($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** J1: multi-way equi-join fact assembly (reference forces hash join;
    * Spark: broadcast the small dims, shuffle only on the fact).
    * customer/nation/region are tiny at any SF relative to lineitem ->
    * explicit broadcast hints keep the big side shuffle-free. */
  def j1MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"o_orderpriority")
      .agg(
        // scaled-long sum: see sum4dp — order-independent at the 2-dp boundary
        round(sum4dp($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** J3: FULL OUTER join with key coalesce (SNP calls x copy-number shape,
    * I2B2_PROCESS_SNP_DATA.sql:108-117). Two pre-aggregated sides so the
    * outer join runs on reduced data (partial-agg-before-join at scale). */
  def j3FullOuter(s: SparkSession, dir: String): DataFrame = {
    val buys = t(s, dir, "events").filter($"event_type" === "purchase")
      .groupBy($"user_id".as("u1")).agg(round(sum($"value"), 2).as("purchase_total"))
    val errs = t(s, dir, "events").filter($"event_type" === "error")
      .groupBy($"user_id".as("u2")).agg(count(lit(1)).as("error_count"))
    buys.join(errs, $"u1" === $"u2", "full_outer")
      .select(
        coalesce($"u1", $"u2").as("user_id"),
        coalesce($"purchase_total", lit(0.0)).as("purchase_total"),
        coalesce($"error_count", lit(0L)).as("error_count"))
  }

  /** J4: LEFT join + coalesce (sample-node value joins,
    * I2B2_LOAD_SAMPLES.sql:319-338). Aggregate-then-join: the orders side
    * is reduced to one row per customer before the join. */
  def j4LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("order_total"), count(lit(1)).as("order_count"))
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_mktsegment",
        coalesce($"order_total", lit(0.0)).as("order_total"),
        coalesce($"order_count", lit(0L)).as("order_count"))
  }

  /** J5: anti-join (NOT EXISTS — new-concept / dropped-patient shape,
    * I2B2_LOAD_CLINICAL_DATA.sql:846-870,949-972). */
  def j5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("customers_without_orders"))
  }

  /** J6: semi-join (EXISTS — numeric-type flag update shape,
    * I2B2_LOAD_CLINICAL_DATA.sql:577-596). */
  def j6SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    c.join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("customers_with_urgent_orders"))
  }

  /** J9: update-join — functional rewrite of `UPDATE ... FROM` (patient
    * demographics refresh, I2B2_LOAD_CLINICAL_DATA.sql:873-893): recompute
    * the column from the joined side, keep all target rows. */
  def j9UpdateJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val recent = t(s, dir, "orders")
      .groupBy($"o_custkey").agg(max($"o_orderdate").as("last_order_date"))
    c.join(recent, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey",
        round(coalesce($"c_acctbal", lit(0.0)), 2).as("acctbal"),
        $"last_order_date")
  }

  /** W1: first_value over (partition by .. order by ..) — canonical study
    * path per study id (AbstractDataProcessor.groovy:108-113). */
  def w1FirstValue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_name")
    t(s, dir, "customer")
      .withColumn("first_customer_in_nation", first($"c_name").over(w))
      .groupBy($"c_nationkey", $"first_customer_in_nation")
      .agg(count(lit(1)).as("n_customers"))
  }

  /** W2/A4: keep-one-per-group (deterministic DISTINCT ON replacement,
    * I2B2_LOAD_CLINICAL_DATA.sql:643-645): row_number over an explicit
    * tiebreak order, keep rn=1. */
  def w2KeepOne(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the test data — the
    // tiebreak order must be total for a deterministic keep-one.
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber", $"l_extendedprice", $"l_partkey", $"l_suppkey")
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_linenumber", round($"l_extendedprice", 2).as("first_price"))
  }

  /** A3: conditional-aggregation pivot (demographics AGE/SEX/RACE shape,
    * I2B2_LOAD_CLINICAL_DATA.sql:804-825): one row per entity, one column
    * per attribute via max(case when ...). */
  def a3Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        round(max(when($"event_type" === "purchase", $"value")), 2).as("max_purchase"),
        round(sum(when($"event_type" === "purchase", $"value").otherwise(lit(0.0))), 2).as("purchase_total"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("click_count"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("error_count"))

  /** A4 (fail path): duplicate detection — GROUP BY key HAVING count>1
    * (I2B2_LOAD_CLINICAL_DATA.sql:654-693). */
  def a4DupDetect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(count(lit(1)).as("dup_count"))
      .filter($"dup_count" > 1)

  /** A5: visit-name consistency — nested conditional aggregation
    * (I2B2_LOAD_CLINICAL_DATA.sql:695-716). */
  def a5NullConsistency(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("urgent_rows"),
        sum(when($"o_orderpriority" =!= "1-URGENT", 1L).otherwise(0L)).as("non_urgent_rows"),
        max(when($"o_orderpriority" === "1-URGENT", $"o_totalprice")).cast("double").as("max_urgent_price_raw"))
      .select($"o_orderstatus", $"urgent_rows", $"non_urgent_rows",
        round($"max_urgent_price_raw", 2).as("max_urgent_price"))

  /** Set ops: EXCEPT + UNION (new-vs-existing patients,
    * I2B2_LOAD_CLINICAL_DATA.sql:846-854,917-921). Customers active in
    * 1994 but not 1995, unioned with the reverse, tagged by direction. */
  def u1SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def activeIn(yr: Int) =
      o.filter(year($"o_orderdate") === yr).select($"o_custkey").distinct()
    val only94 = activeIn(1994).except(activeIn(1995))
      .withColumn("direction", lit("1994_only"))
    val only95 = activeIn(1995).except(activeIn(1994))
      .withColumn("direction", lit("1995_only"))
    only94.union(only95)
      .groupBy($"direction").agg(count(lit(1)).as("n_customers"))
  }

  /** P2: matrix melt — wide measures to long (probe-matrix melt shape,
    * ExpressionDataProcessor.groovy:214-239) via `stack`, then aggregate. */
  def p2Melt(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        expr("stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
          "'discount', l_discount, 'tax', l_tax) as (metric, value)"))
      .groupBy($"metric")
      .agg(round(sum($"value"), 2).as("metric_sum"),
        round(avg($"value"), 4).as("metric_avg"),
        count(lit(1)).as("n_values"))

  /** One-scan column profiler ([[graft.operators.Profile.columnProfile]])
    * over the EAV quartet of customer columns — row/null/exact-distinct
    * counts and the byte-order value range per column. */
  def profileColumns(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.columnProfile(t(s, dir, "customer"),
      Seq("c_name", "c_mktsegment", "c_acctbal", "c_nationkey"))

  // Column-name sugar for $"..." outside of spark.implicits scope.
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared omics z-score pipeline — the reference implements this six
  * times (mrna/rnaseq/protein/metabolomics/mirna/rbm; e.g.
  * I2B2_PROCESS_MRNA_DATA.sql:236-331, I2B2_RBM_ZSCORE_CALC_NEW.sql:218-246):
  *
  *  1. raw_intensity = value (dataType R) | logBase^value (L, 0 if base -1)
  *  2. log_intensity = value (dataType L) | ln(value)/ln(logBase)
  *  3. per-group avg / exact median / sample stddev of log_intensity
  *  4. zscore = 0 when stddev = 0, else clamp((log - median)/stddev, ±2.5)
  *
  * The six procs differ in one detail: the proteomics/mirna/rbm flavor
  * logs `value + 0.001` (zero guard) and rounds the log to 4 dp BEFORE
  * the stats (i2b2_proteomics_zscore_calc.sql:122,150); the mrna/rnaseq
  * flavor logs the value directly. `zeroGuard`/`logRoundDp` select the
  * flavor; defaults are the mrna semantics.
  *
  * Spark shape: one narrow projection, then ONE partition-only window
  * pass over the probe-key partitioning (avg/percentile/stddev as window
  * aggregates) — a single shuffle of the facts and a single evaluation of
  * the upstream plan. The older aggregate-then-join-back shape evaluated
  * the (scan- or melt-fed) input twice; do not reintroduce it. Group
  * sizes are bounded by the sample count, so the window buffer stays
  * small at any corpus scale (pinned by PlanAuditSpec's single-scan
  * audit). The reference's mid-pipeline index creation dissolves into
  * the shuffle partitioning.
  *
  * Null group keys: Window.partitionBy groups NULL keys into one
  * partition (standard SQL window semantics), so rows with a null probe
  * key get stats over the null group — the join-back shape silently
  * dropped them. Pinned by a spec.
  */
object ZScore {

  /** RBM "R" log (I2B2_RBM_ZSCORE_CALC_NEW.sql:185): the +0.001 zero guard
    * applies ONLY when the value is <= 0, unlike proteomics' always-on
    * guard. */
  def rbmLog(v: Column): Column =
    when(v <= 0, log(2.0, v + lit(0.001))).otherwise(log(2.0, v))

  /** miRNA-seq "R" log (I2B2_MIRNA_ZSCORE_CALC.sql:118-120): 0 when the
    * value is <= 0, else log2, rounded to 5 dp BEFORE the stats. */
  def mirnaSeqLog(v: Column): Column =
    round(when(v <= 0, lit(0.0)).otherwise(log(2.0, v)), 5)

  /** miRNA-qPCR log (I2B2_MIRNA_ZSCORE_CALC.sql:160-177): a dCt value IS
    * minus the log already, so log_intensity = -value. */
  def qpcrLog(v: Column): Column = -v

  /** dataType: "R" (raw) or "L" (already log-transformed) — the
    * file-name-encoded `_Data_[RLTZ]` convention. `customLog` overrides
    * the R-side log computation for the per-datatype flavors above. */
  def pipeline(df: DataFrame, groupCols: Seq[String], valueCol: String,
               dataType: String = "R", logBase: Double = 2.0,
               zeroGuard: Double = 0.0,
               logRoundDp: Option[Int] = None,
               customLog: Option[Column => Column] = None): DataFrame = {
    val v = col(valueCol).cast("double")
    val raw = if (dataType == "R") v
      else if (logBase == -1.0) lit(0.0)
      else pow(lit(logBase), v)
    val logRaw = if (dataType == "L") v
      else customLog.map(_(v))
        .getOrElse(log(v + lit(zeroGuard)) / log(lit(logBase)))
    val logI = logRoundDp.map(d => round(logRaw, d)).getOrElse(logRaw)

    val withLogs = df
      .withColumn("raw_intensity", raw)
      .withColumn("log_intensity", logI)

    // Per-group stats as ONE window pass over the group partitioning:
    // the aggregate-then-join-back shape evaluates the upstream plan
    // twice (once under the partial agg, once as the join probe) — on a
    // scan- or melt-fed input that doubles the expensive side. A
    // partition-only window is one shuffle on the probe key and one pass;
    // group sizes are bounded by the sample count, so the window buffer
    // stays small at any corpus scale.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    withLogs.select(
      col("*"),
      avg(col("log_intensity")).over(w).as("mean_intensity"),
      percentile(col("log_intensity"), lit(0.5)).over(w).as("median_intensity"),
      stddev_samp(col("log_intensity")).over(w).as("stddev_intensity"))
      .withColumn("zscore", zscoreClamped(
        col("log_intensity"), col("median_intensity"), col("stddev_intensity")))
  }

  /** 0 when stddev is 0/NULL, else (v - median)/stddev clamped to ±2.5. */
  def zscoreClamped(logI: Column, median: Column, stddev: Column): Column =
    when(stddev.isNull || stddev === 0, lit(0.0))
      .otherwise(least(greatest((logI - median) / stddev, lit(-2.5)), lit(2.5)))
}

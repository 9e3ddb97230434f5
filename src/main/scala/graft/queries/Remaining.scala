package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Remaining SURVEY §2 inventory items as oracle-checked queries:
  * F3 (tag substitution), F5 (visit-name suppression), A6/J2 (probe
  * averaging over an inner-join chain), A11 (min-record dedup). */
object Remaining {

  // Plain load: scan-dominant shapes — the r6 blanket repartition regressed
  // them 1.4-2.7x (see Tables.loadParallel scaladoc for when it DOES pay).
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** F3: `$$TAG` placeholder substitution in category codes
    * (TagReplacer.groovy:57-112): the tag resolves to another column's row
    * value; rows with an empty tag value are dropped. Demonstrated with a
    * literal template over part rows. */
  def f3TagSubstitution(s: SparkSession, dir: String): DataFrame = {
    val template = "Parts+$$BRAND+Sized"
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        when(length(coalesce(col("p_brand"), lit(""))) > 0,
          replace(lit(template), lit("$$BRAND"), col("p_brand")))
          .as("category_cd"))
      .filter(col("category_cd").isNotNull)
      .withColumn("category_path",
        regexp_replace(col("category_cd"), "\\+", "\\\\"))
  }

  /** F5: visit-name suppression — null the visit when a category has only
    * one distinct visit (group-having shape, SQL:342-369) or the visit
    * equals the data label (SQL:381-406). Events stand in: event_type =
    * category, props-k = visit. */
  def f5VisitSuppress(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("visit_name"))
    // The reference's shape is a group-HAVING (SQL:342-369), not a per-row
    // window: one map-side-combinable countDistinct per category, joined
    // back broadcast — no per-row collect_set materialization, no skew on
    // a hot category key.
    val counts = broadcast(
      e.groupBy(col("event_type").as("__et"))
        .agg(countDistinct(col("visit_name")).as("n_visits")))
    e.join(counts, col("event_type") <=> col("__et"), "left")
      .withColumn("visit_name_out",
        when(col("n_visits") === 1, lit(null).cast("string"))
          .when(col("visit_name") === col("event_type"), lit(null).cast("string"))
          .otherwise(col("visit_name")))
      .select(col("event_id"), col("event_type"), col("visit_name_out"))
  }

  /** A6 + J2: duplicate-probe intensity averaging over the inner-join
    * chain (expression rows x sample map x probe registry,
    * I2B2_PROCESS_MRNA_DATA.sql:136-161). lineitem x part x supplier. */
  def a6ProbeAvg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = broadcast(t(s, dir, "part"))
    val sup = broadcast(t(s, dir, "supplier"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"))
      .agg(round(avg(col("l_extendedprice")), 4).as("avg_intensity"),
        count(lit(1)).as("n_probes"))
  }

  /** A11: min-record dedup (`SELECT path, MIN(record_id) GROUP BY path`,
    * I2B2_CREATE_FULL_TREE.sql:21-28). */
  def a11MinRecord(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(min(col("l_orderkey")).as("min_record_id"))

  /** Flagship: the full clinical ETL pipeline (§3.1) end-to-end — the
    * customer table plays a clinical wide file (SUBJ_ID = c_name, a text
    * variable and a numeric variable), through explode -> cleanse ->
    * group-scoped type inference -> N/T leaf shaping -> dedup -> tree ->
    * per-node distinct patient counts. The DuckDB oracle recomputes the
    * expected tree counts independently, so the whole pipeline is under
    * the hash gate, not just its pieces. */
  def pipelineClinicalE2e(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.ClinicalMapping._
    // loadParallel, not plain load: the pipeline now materializes the
    // cleansed EAV once (ClinicalPipeline.run's work-table checkpoint), so
    // a single-split input would serialize the regex-heavy explode+cleanse
    // into one task; spreading the scan lets that one pass use every core
    val customer = Tables.loadParallel(s, dir, "customer")
    // customer columns: 1 c_custkey, 2 c_name, 3 c_nationkey, 4 c_acctbal,
    // 5 c_mktsegment
    val entries = Seq(
      Entry("customer", "", 1, "STUDY_ID", None, None, Nil),
      Entry("customer", "", 2, "SUBJ_ID", None, None, Nil),
      Entry("customer", "Customers+Demographics", 5, "Market Segment", None, None, Nil),
      Entry("customer", "Customers+Demographics", 4, "Account Balance", None, None, Nil))
    graft.pipeline.ClinicalPipeline.run(s, "TPCH", "\\Public Studies\\TPCH",
      Mapping(entries, MergeMode.Replace), Map("customer" -> customer))
      .conceptCounts
  }

  /** Flagship #2: the omics pipeline (§3.2) end-to-end — suppliers play
    * samples, parts play probes, lineitem prices play intensities. Sample
    * mapping -> assay ids -> duplicate-probe averaging -> per-probe
    * median/stddev -> clamped z-score, all recomputed independently by
    * the DuckDB oracle. */
  def pipelineOmicsE2e(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val sampleMap = sup.select(
      lit("TPCH").as("study_id"), lit("").as("site_id"),
      col("s_name").as("subject_id"), col("s_name").as("sample_id"),
      lit("GPL1").as("platform_name"), lit("Tissue").as("tissuetype"),
      lit(null).cast("string").as("attr1"), lit(null).cast("string").as("attr2"),
      lit("Biomarker_Data+PLATFORM+TISSUETYPE").as("category_cd"))
    // plain load: the probe-averaging groupBy shuffles the melt
    // immediately, so a pre-repartition would only add an exchange
    val melted = t(s, dir, "lineitem")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").cast("string").as("probeset_id"),
        col("s_name").as("sample_id"),
        col("l_extendedprice").as("intensity_value"))
    val platform = s.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("probeset_id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("gene_symbol",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("gene_id",
            org.apache.spark.sql.types.LongType))))
    graft.pipeline.OmicsPipeline.run(s, "TPCH", "\\Studies\\TPCH",
      sampleMap, melted, platform, dataType = "R", logBase = 2.0)
      .data
      // `+ 0.0` collapses IEEE -0.0 (a rounded tiny-negative zscore) to 0.0
      // so the value hashes identically on any engine.
      .select(col("probeset_id"), col("assay_id"),
        (round(col("raw_intensity"), 4) + lit(0.0)).as("raw_intensity"),
        (round(col("log_intensity"), 6) + lit(0.0)).as("log_intensity"),
        (round(col("zscore"), 4) + lit(0.0)).as("zscore"))
  }

  /** F8: the row-level validation-rule DSL under the gate — the production
    * ValidationRules compiler runs four rule shapes (required, one-sided
    * range, between-range, conditional range) over customer balances; one
    * row per rule with the violation count and the sorted violator list.
    * DuckDB recomputes each predicate independently. */
  def f8Validation(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.ValidationRules
    val c = t(s, dir, "customer").select(
      col("c_name"), col("c_acctbal").cast("string").as("v"), col("c_mktsegment"))
    val rules = ValidationRules.parse(
      "required; >0; between 100 to 5000; <9000, when \"c_mktsegment\" is equal to \"BUILDING\"")
    rules.map { r =>
      val bad = ValidationRules.violates(r, col("v"), col(_))
      c.agg(
        sum(when(bad, 1L).otherwise(0L)).as("n_violations"),
        array_join(sort_array(collect_list(when(bad, col("c_name")))), ",")
          .as("violator_ids"))
        .withColumn("rule", lit(r.source))
    }.reduce(_ unionByName _)
  }

  /** §2.9 replace_last_path_component (REPLACE_LAST_PATH_COMPONENT.sql):
    * each nation node gets its last component renamed to a derived name. */
  def fnReplaceLast(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PathFunctions._
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").cast("long").as("node_id"),
        concat(lit("\\Public Studies\\"), col("r_name"), lit("\\"),
          col("n_name"), lit("\\")).as("c_fullname"))
      .withColumn("renamed", replaceLastPathComponent(col("c_fullname"),
        concat(lit("Node "), col("node_id").cast("string"))))
  }

  /** W4 (streaming batch twin): tumbling 1-hour window aggregate over the
    * event stream — the batch form of EventStream.windowedCounts, so both
    * sides of the lambda-free architecture agree on window semantics.
    * `ts` is epoch-nanos (Tables.load normalizes either physical type). */
  def w4WindowAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(expr("ts DIV 3600000000000").as("hour_bucket"),
        col("event_type"), col("user_id"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))

  /** §2.9 sequences: deterministic surrogate ids — distributed dense rank
    * over a total order replaces nextval() (stable across runs, which the
    * reference's sequences are not; SURVEY §7.3). Uses [[graft.core.Ids
    * .denseIds]]: range-partitioned sort + per-partition offsets, no
    * single-partition global window. */
  def seqSurrogateIds(s: SparkSession, dir: String): DataFrame =
    graft.core.Ids.denseIds(
      t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
      Seq("c_name", "c_custkey"), "patient_num")
}

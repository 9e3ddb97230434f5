package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full I2B2_LOAD_SAMPLES build (reference
  * sql/postgres/procedures/I2B2_LOAD_SAMPLES.sql) — the deep part of the
  * omics load that OmicsPipeline.sampleNodePath only sketched:
  *
  *  1. node values: DISTINCT sample-map attribute tuples, platform/tissue
  *     defaulted, LEFT-joined to the de_gpl_info registry for the platform
  *     *title* (:319-338) — the title, not the platform name, lands in the
  *     ontology path.
  *  2. ontology nodes: the LEAF node substitutes every placeholder of
  *     category_cd (:355-375); one extra node per placeholder type
  *     (PLATFORM :393-421, TISSUETYPE, ATTR1 :443-470, ATTR2) is built from
  *     the category prefix up to and including that placeholder, keeping
  *     only the attributes whose placeholder occurs in the prefix at
  *     position > 1 (the reference's instr() guards — reproduced exactly,
  *     including the position-1 exclusion).
  *  3. de_subject_sample_mapping: sample map INNER patient_dimension (on
  *     the collapsed TRIAL:SITE:SUBJECT sourcesystem_cd) INNER LEAF node
  *     LEFT the four typed nodes for their concept codes (:596-856); the
  *     reference's raw-vs-coalesced join asymmetry on platform/tissue_type
  *     (a.platform = ln.platform, null never matches) is kept.
  *  4. per-sample category facts: one DISTINCT (patient, leaf concept,
  *     trial, 'T','E') observation per mapped sample (:841-870).
  *
  * Concept codes: the reference draws them from a DB sequence at node
  * insert; we derive them deterministically as md5(path) prefixes so runs
  * (and engines) agree.
  *
  * Scale: node frames are DISTINCT attribute combinations — tiny — so all
  * five node joins broadcast; the only large frames are the sample map and
  * patient dimension, joined once on usubjid.
  */
object LoadSamples {

  final case class LoadSamplesTables(
      nodes: DataFrame, sampleMapping: DataFrame, sampleFacts: DataFrame)

  /** topNode || substituted(categoryPrefix) || '\' with backslash runs
    * collapsed (reference :365-367). Substitution order is the
    * reference's: PLATFORM -> `platformVal`, ATTR1, ATTR2, TISSUETYPE,
    * then '+' -> '\' and '_' -> ' '. The mRNA proc substitutes the gpl
    * TITLE (I2B2_LOAD_SAMPLES.sql:365), while the RNASeq proc substitutes
    * the platform ID itself (I2B2_PROCESS_RNA_DATA.sql:349) — callers
    * choose via [[run]]'s `platformNodeFromTitle`. */
  private def nodePath(topNode: String, catPrefix: Column,
                       platformVal: Column): Column = {
    val substituted =
      regexp_replace(regexp_replace(
        replace(replace(replace(replace(
          catPrefix,
          lit("PLATFORM"), coalesce(platformVal, lit(""))),
          lit("ATTR1"), coalesce(col("attribute_1"), lit(""))),
          lit("ATTR2"), coalesce(col("attribute_2"), lit(""))),
          lit("TISSUETYPE"), coalesce(col("tissue_type"), lit(""))),
        "\\+", "\\\\"), "_", " ")
    concat(lit(topNode),
      regexp_replace(concat(substituted, lit("\\")), "(\\\\){2,}", "\\\\"))
  }

  /** substr(cat, 1, instr(cat, ph) + len(ph)) — the prefix through the
    * placeholder INCLUDING one following separator char, the reference's
    * `instr(...)+8` idiom (:394). */
  private def catPrefix(ph: String, cat: Column): Column =
    cat.substr(lit(1), instr(cat, ph) + lit(ph.length))

  /** The reference's attribute guard: keep the attribute only when its
    * placeholder occurs in the prefix at position > 1 (:399-401). */
  private def guarded(prefix: Column, ph: String, attr: Column): Column =
    when(instr(prefix, ph) > 1, attr).otherwise(lit(""))

  /** One typed intermediate node per distinct attribute tuple whose
    * category mentions `ph`. */
  private def typedNodes(topNode: String, nodeValues: DataFrame,
                         nodeType: String, ph: String,
                         extraFilter: Column, platformVal: Column): DataFrame = {
    val prefix = catPrefix(ph, col("category_cd"))
    nodeValues
      .filter(col("category_cd").contains(ph) && extraFilter)
      .select(
        nodePath(topNode, prefix, platformVal).as("leaf_node"),
        prefix.as("category_cd"),
        (if (ph == "PLATFORM") col("platform")
         else guarded(prefix, "PLATFORM", col("platform"))).as("platform"),
        (if (ph == "TISSUETYPE") col("tissue_type")
         else guarded(prefix, "TISSUETYPE", col("tissue_type"))).as("tissue_type"),
        (if (ph == "ATTR1") col("attribute_1")
         else guarded(prefix, "ATTR1", col("attribute_1"))).as("attribute_1"),
        (if (ph == "ATTR2") col("attribute_2")
         else guarded(prefix, "ATTR2", col("attribute_2"))).as("attribute_2"),
        lit(nodeType).as("node_type"))
  }

  /** @param sampleMap lt_src_mrna_subj_samp_map: (site_id, subject_id,
    *                  sample_cd, platform, tissue_type, attribute_1,
    *                  attribute_2, category_cd)
    * @param gplInfo   de_gpl_info: (platform, title, marker_type)
    * @param patients  patient_dimension: (patient_num: long,
    *                  sourcesystem_cd)
    * @param markerType upper-cased marker type filter (:335)
    * @param platformNodeFromTitle true = mRNA semantics (PLATFORM node
    *        value is the gpl TITLE, I2B2_LOAD_SAMPLES.sql:365); false =
    *        RNASeq semantics (the platform ID itself,
    *        I2B2_PROCESS_RNA_DATA.sql:349) */
  def run(spark: SparkSession, trialId: String, topNode: String,
          sampleMap: DataFrame, gplInfo: DataFrame, patients: DataFrame,
          markerType: String = "GENE EXPRESSION",
          platformNodeFromTitle: Boolean = true): LoadSamplesTables = {
    val platformVal =
      if (platformNodeFromTitle) col("title") else col("platform")

    // 1. node values (:319-338): attribute tuples + platform title
    val nodeValues = sampleMap
      .select(col("category_cd"),
        coalesce(col("platform"), lit("GPL570")).as("platform"),
        coalesce(col("tissue_type"), lit("Unspecified Tissue Type")).as("tissue_type"),
        col("attribute_1"), col("attribute_2"))
      .distinct()
      .join(broadcast(gplInfo
          .filter(upper(col("marker_type")) === markerType)
          .select(col("platform"), col("title"))),
        Seq("platform"), "left")

    // 2. ontology nodes: LEAF + one node per placeholder type
    val leaf = nodeValues.select(
      nodePath(topNode, col("category_cd"), platformVal).as("leaf_node"),
      col("category_cd"), col("platform"), col("tissue_type"),
      col("attribute_1"), col("attribute_2"),
      lit("LEAF").as("node_type"))
    val nodes = Seq(
        leaf,
        typedNodes(topNode, nodeValues, "PLATFORM", "PLATFORM", lit(true), platformVal),
        typedNodes(topNode, nodeValues, "TISSUETYPE", "TISSUETYPE", lit(true), platformVal),
        typedNodes(topNode, nodeValues, "ATTR1", "ATTR1", col("attribute_1").isNotNull, platformVal),
        typedNodes(topNode, nodeValues, "ATTR2", "ATTR2", col("attribute_2").isNotNull, platformVal))
      .reduce(_ unionByName _)
      // ONE distinct for all five branches: each branch carries a constant,
      // branch-unique node_type literal, so no row can collide across
      // branches and union-then-distinct equals distinct-per-branch —
      // one shuffle instead of five. (No title column: wt_mrna_nodes drops
      // it, so path-identical nodes from different platforms collapse here
      // exactly like the reference.)
      .distinct()
      .withColumn("concept_cd", substring(md5(col("leaf_node")), 1, 16))
      // five byType broadcasts consume this tiny frame (distinct attribute
      // tuples); without materialization each broadcast re-runs the whole
      // node build. Coalesce first so checkpointing + five broadcast scans
      // of a node-sized frame cost single tasks, not a stage's worth of
      // near-empty shuffle partitions.
      // LAZY localCheckpoint (not cache) so library callers don't
      // accumulate CacheManager entries (blocks free on GC) and the node
      // build doesn't run a driver-blocking job at plan-BUILD time — the
      // first consumer (the shared node broadcast) materializes it.
      // No coalesce(1): it would collapse the distinct's reduce side onto
      // one core and serialize the regex-heavy nodePath evaluation.
      .localCheckpoint(false)

    // ONE broadcast of the whole node-sized frame, node_type filtered in
    // each join condition: the five typed joins then share a single
    // BroadcastExchange (ReusedExchange) instead of building five
    // broadcasts of five filtered scans — fewer jobs, same semantics
    // (an unmatched node_type simply never satisfies the join condition).
    val nodesB = broadcast(
      nodes.select(col("leaf_node"), col("category_cd"), col("platform"),
        col("tissue_type"), col("attribute_1"), col("attribute_2"),
        col("concept_cd"), col("node_type")))

    // 3. the mapping join chain (:596-856). The typed-join conditions need
    // `when(instr(prefix, otherPh) > 1, attr)` guards per (placeholder,
    // attribute) pair; computing them ONCE as projection columns — instead
    // of embedding the instr/substr trees inside every join condition —
    // keeps the join keys plain column references (clean equi-keys for the
    // broadcast hash join) and cuts the Catalyst tree size roughly 4x,
    // which is most of this pipeline's per-call planning latency.
    val phAttrs = Seq(
      "PLATFORM" -> "platform", "TISSUETYPE" -> "tissue_type",
      "ATTR1" -> "attribute_1", "ATTR2" -> "attribute_2")
    // ONE projection for usubjid + all 12 guard columns: every
    // DataFrame operation re-analyzes the plan eagerly, so 13 chained
    // withColumns would pay 13 analyzer passes over a growing tree —
    // measurable per-call driver latency on a plan this size.
    val guardCols = phAttrs.flatMap { case (ph, _) =>
      val prefix = catPrefix(ph, col("category_cd"))
      phAttrs.filter(_._1 != ph).map { case (otherPh, c) =>
        when(instr(prefix, otherPh) > 1, col(c)).otherwise(lit(""))
          .as(s"__g_${ph}_$c")
      }
    }
    val a = sampleMap.alias("a").select(
      col("*") +:
        graft.functions.CleansingFunctions.usubjid(
          lit(trialId), coalesce(col("site_id"), lit("")), col("subject_id"))
          .as("usubjid") +:
        guardCols: _*)
    val pd = patients.select(col("patient_num"), col("sourcesystem_cd"))

    val ln = nodesB.alias("ln")
    val joined = a
      .join(pd, a("usubjid") === pd("sourcesystem_cd"))
      .join(ln,
        col("ln.node_type") === "LEAF" &&
          a("platform") === col("ln.platform") &&
          a("tissue_type") === col("ln.tissue_type") &&
          coalesce(a("attribute_1"), lit("")) === coalesce(col("ln.attribute_1"), lit("")) &&
          coalesce(a("attribute_2"), lit("")) === coalesce(col("ln.attribute_2"), lit("")))

    def typedJoin(df: DataFrame, alias: String, t: String, ph: String,
                  selfAttr: String): DataFrame = {
      val n = nodesB.alias(alias)
      val selfCond = a(selfAttr) === col(s"$alias.$selfAttr")
      val conds = phAttrs
        .filter(_._1 != ph)
        .map { case (_, c) =>
          a(s"__g_${ph}_$c") === coalesce(col(s"$alias.$c"), lit(""))
        }
      val typed = col(s"$alias.node_type") === t
      df.join(n, conds.foldLeft(typed && selfCond)(_ && _), "left")
    }

    val full = Seq(
      ("pn", "PLATFORM", "PLATFORM", "platform"),
      ("ttp", "TISSUETYPE", "TISSUETYPE", "tissue_type"),
      ("a1", "ATTR1", "ATTR1", "attribute_1"),
      ("a2", "ATTR2", "ATTR2", "attribute_2"))
      .foldLeft(joined) { case (df, (al, t, ph, self)) => typedJoin(df, al, t, ph, self) }

    val mapping = full.select(
      col("patient_num").as("patient_id"),
      a("site_id"), a("subject_id"), a("sample_cd"),
      col("ln.concept_cd").as("concept_code"),
      a("attribute_1").as("sample_type"),
      col("a1.concept_cd").as("sample_type_cd"),
      lit(trialId).as("trial_name"),
      a("attribute_2").as("timepoint"),
      col("a2.concept_cd").as("timepoint_cd"),
      col("ln.tissue_type").as("tissue_type"),
      col("ttp.concept_cd").as("tissue_type_cd"),
      col("pn.concept_cd").as("platform_cd"),
      concat(col("ln.concept_cd"), lit("-"), col("patient_num").cast("string"))
        .as("data_uid"),
      a("platform").as("gpl_id"),
      a("category_cd"))

    // 4. per-sample category facts (:841-870)
    val facts = mapping.select(
      col("patient_id").as("patient_num"),
      col("concept_code").as("concept_cd"),
      lit(trialId).as("modifier_cd"),
      lit("T").as("valtype_cd"),
      lit("E").as("tval_char"),
      lit(trialId).as("sourcesystem_cd")).distinct()

    LoadSamplesTables(nodes, mapping, facts)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{SecurityOps, TreeOps}
import graft.sources.{AcghMelt, VcfReader}

/** Gate-wideners for the source-explode and maintenance operators that
  * were spec-only: aCGH column-group melt (P3), VCF per-sample subject
  * summary with R/V encoding (P4), VCF INFO explode (P5), the metadata-XML
  * builder, security upsert/token transplant, and explicit node
  * add/delete. Inputs are synthesized deterministically from the TPC-H
  * tables so DuckDB recomputes each flow independently (same tier as
  * OmicsQueries / MergeQueries).
  */
object SourcesAndOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------------- P3 aCGH

  /** Wide 7-metrics-per-sample frame (2 samples), then the group melt. */
  def p3AcghMelt(s: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey")
    val r = col("n_regionkey")
    val wide = t(s, dir, "nation").select(
      concat(lit("R"), k.cast("string")).as("region_id"),
      (k * 2).as("S1.chip"), (k % 3).as("S1.segmented"), (k % 2).as("S1.flag"),
      (k % 5).as("S1.probloss"), (k % 7).as("S1.probnorm"),
      (k % 11).as("S1.probgain"), (k % 13).as("S1.probamp"),
      (r * 3).as("S2.chip"), (r % 2).as("S2.segmented"), (r % 3).as("S2.flag"),
      (r % 5).as("S2.probloss"), ((r + k) % 7).as("S2.probnorm"),
      ((r + k) % 11).as("S2.probgain"), ((r + k) % 13).as("S2.probamp"))
    AcghMelt.melt(wide, "region_id")
  }

  // -------------------------------------------------------- P4 / P5 VCF

  private val GtOptions =
    Seq("0/1", "1|2", "./.", "0/0", "1", ".", "0|2", "2/1")

  /** Variants frame with the shape VcfReader.variants produces, synthesized
    * from `part`: multi-alt / multi-rsid rows, three samples, shuffled
    * FORMAT orders and a GT-less FORMAT, haploid and missing genotypes. */
  private def syntheticVariants(s: SparkSession, dir: String): DataFrame = {
    val k = col("p_partkey")
    val fmt = when(k % 11 === 0, lit("DP:GT"))
      .when(k % 13 === 0, lit("DP"))
      .otherwise(lit("GT:DP"))
    val gtArr = array(GtOptions.map(lit): _*)
    def gt(off: Int): Column =
      element_at(gtArr, ((k + off) % 8 + 1).cast("int"))
    val dp = (k % 50).cast("string")
    def sampleValue(off: Int): Column =
      when(fmt === "GT:DP", concat(gt(off), lit(":"), dp))
        .when(fmt === "DP:GT", concat(dp, lit(":"), gt(off)))
        .otherwise(dp)
    t(s, dir, "part").select(
      concat(lit("chr"), (k % 5).cast("string")).as("chrom"),
      k.cast("long").as("pos"),
      when(k % 7 === 0,
        concat(lit("rs"), k.cast("string"), lit(";rs"), (k + 100000).cast("string")))
        .otherwise(concat(lit("rs"), k.cast("string"))).as("rs_id"),
      element_at(array(lit("A"), lit("C"), lit("G"), lit("T"), lit("AT")),
        (k % 5 + 1).cast("int")).as("ref"),
      when(k % 3 === 0, lit("G,T")).when(k % 3 === 1, lit("C"))
        .otherwise(lit("TA")).as("alt"),
      fmt.as("format"),
      array(sampleValue(0), sampleValue(1), sampleValue(2)).as("sample_values"))
  }

  /** de_variant_subject_summary rows: per-sample explode, R/V variant /
    * variantFormat encoding, SNV-vs-DIV, rs_id probeset explode. */
  def p4VcfSummary(s: SparkSession, dir: String): DataFrame =
    VcfReader.subjectSummary(syntheticVariants(s, dir),
      Seq("SM1", "SM2", "SM3"), "TPCH")

  /** INFO explode against declared fields: Integer scalar, Float list,
    * bare Flag AND explicit-value Flag (`DB=0` keeps its 0), a present
    * String field (text_value), and an absent field (filtered out). */
  def p5VcfInfo(s: SparkSession, dir: String): DataFrame = {
    val k = col("p_partkey")
    val info = concat(
      lit("DP="), (k % 100).cast("string"),
      when(k % 2 === 0, concat(lit(";AF=0."), (k % 9).cast("string"),
        lit(",0."), ((k + 3) % 9).cast("string"))).otherwise(lit("")),
      when(k % 3 === 0, lit(";VT=SNP")).otherwise(lit("")),
      when(k % 10 === 0, lit(";DB=0"))
        .when(k % 5 === 0, lit(";DB")).otherwise(lit("")))
    val df = t(s, dir, "part").select(
      concat(lit("chr"), (k % 5).cast("string")).as("chrom"),
      k.cast("long").as("pos"),
      concat(lit("rs"), k.cast("string")).as("rs_id"),
      info.as("info"))
    VcfReader.explodeInfo(df, Seq(
      VcfReader.InfoField("DP", "1", "Integer"),
      VcfReader.InfoField("AF", "A", "Float"),
      VcfReader.InfoField("DB", "0", "Flag"),
      VcfReader.InfoField("VT", "1", "String"),
      VcfReader.InfoField("XX", "1", "String")))
  }

  // --------------------------------------------------- metadata XML (2.9)

  /** ValueMetadata XML over the four display-name families: Baseline,
    * unit-first ('Week -11' / 'Month 4'), interval ('12 days 0 hours'),
    * and unparseable (NULL xml on the TIMEPOINT path). */
  def fnMetadataXml(s: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey")
    val name = when(k % 5 === 0, lit("Baseline"))
      .when(k % 5 === 1, concat(lit("Week "), (k - 12).cast("string")))
      .when(k % 5 === 2, concat(k.cast("string"), lit(" days "),
        (k % 12).cast("string"), lit(" hours")))
      .when(k % 5 === 3, lit("not a timepoint"))
      .otherwise(concat(lit("Month "), k.cast("string")))
    t(s, dir, "nation").select(
      k.as("id"),
      name.as("display_name"),
      when(k % 3 === 0, lit("N")).otherwise(lit("T")).as("data_type"),
      when(k % 2 === 0, lit("TIMEPOINT")).otherwise(lit(null).cast("string"))
        .as("valuetype_cd"))
      .withColumn("metadataxml",
        graft.functions.MetadataXml.metadataXml(
          col("display_name"), col("data_type"), col("valuetype_cd")))
  }

  // ------------------------------------------------- security ops (2.10)

  /** bio_experiment-style upsert (new rows win, keyed on accession) then
    * the replace-study EXP: token transplant over the merged frame. */
  def securityOps(s: SparkSession, dir: String): DataFrame = {
    val c = col("c_custkey")
    val existing = t(s, dir, "customer").select(
      concat(lit("ST"), (c % 40).cast("string")).as("accession"),
      concat(lit("Old "), (c % 40).cast("string")).as("title"),
      when(c % 2 === 0, lit("EXP:STUDY_A")).otherwise(lit("EXP:PUBLIC"))
        .as("secure_obj_token"))
      .distinct()
    val incoming = t(s, dir, "nation").select(
      concat(lit("ST"), col("n_nationkey").cast("string")).as("accession"),
      concat(lit("New "), col("n_nationkey").cast("string")).as("title"),
      lit("EXP:STUDY_A").as("secure_obj_token"))
    SecurityOps.swapSecurityTokens(
      SecurityOps.upsertByKey(existing, incoming, Seq("accession")),
      "secure_obj_token", "STUDY_A", "STUDY_B")
  }

  // ----------------------------------------------------- node ops (2.10)

  /** Explicit add-nodes (one fresh folder + one replaced leaf, whose facts
    * drop) followed by a single-node delete, over a geo tree with
    * per-customer facts. Output: final i2b2 with per-node fact counts. */
  def nodeOps(s: SparkSession, dir: String): DataFrame = {
    val geo = t(s, dir, "nation").join(t(s, dir, "region"),
      col("n_regionkey") === col("r_regionkey"))
    val leafOf = concat(lit("\\T\\"), col("r_name"), lit("\\"), col("n_name"), lit("\\"))
    val i2b2 = TreeOps.fillInTree(geo.select(leafOf.as("leaf")), "leaf")
      .withColumn("c_basecode", substring(md5(col("c_fullname")), 1, 16))
    val concepts = i2b2.select(col("c_fullname").as("concept_path"),
      col("c_basecode").as("concept_cd"))
    val facts = t(s, dir, "customer")
      .join(geo.select(col("n_nationkey"), leafOf.as("leaf")),
        col("c_nationkey") === col("n_nationkey"))
      .select(substring(md5(col("leaf")), 1, 16).as("concept_cd"),
        col("c_custkey").as("patient_num"))
    val t0 = TreeOps.NodeTables(concepts, i2b2, facts)
    val t1 = TreeOps.addNodes(s, t0,
      Seq("\\T\\Extra\\", "\\T\\AFRICA\\ALGERIA\\"), Some("TPCH"))
    val t2 = TreeOps.deleteNode(t1, "\\T\\AMERICA\\BRAZIL\\")
    t2.i2b2
      .join(t2.observationFact.groupBy(col("concept_cd"))
        .agg(count(lit(1)).as("n_facts")),
        col("c_basecode") === col("concept_cd"), "left")
      .select(col("c_fullname"), col("c_hlevel").cast("long").as("c_hlevel"),
        col("c_name"), col("c_basecode"),
        coalesce(col("n_facts"), lit(0L)).as("n_facts"))
  }
}

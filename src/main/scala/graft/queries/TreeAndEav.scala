package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Eav, TreeOps}
import graft.functions.PathFunctions._
import graft.functions.CleansingFunctions._

/** Ontology-tree + EAV operator coverage (SURVEY §2.4 A1/A8/A9, §2.6 P1/P7,
  * §2.9 path scalars) over the TPC-H-ish tables: the geography hierarchy
  * region -> nation -> customer stands in for the concept tree, customers
  * for patients.
  */
object TreeAndEav {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Leaf path per customer: `\REGION\NATION\Customer#x\`. Dim joins are
    * broadcast (region/nation are tiny at every SF). */
  private def customerPaths(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select(
        concat(lit("\\"), col("r_name"), lit("\\"), col("n_name"), lit("\\"),
          col("c_name"), lit("\\")).as("path"),
        col("c_custkey"))
  }

  /** P1: wide->EAV explode (clinical fact explode shape). */
  def p1EavExplode(s: SparkSession, dir: String): DataFrame =
    Eav.explodeToEav(t(s, dir, "customer"),
      keyCols = Seq("c_custkey"),
      attrCols = Seq("c_name", "c_mktsegment", "c_acctbal", "c_nationkey"))

  /** A1: group-scoped numeric-vs-text inference with the reference's
    * inverted is_numeric semantics. */
  def a1TypeInference(s: SparkSession, dir: String): DataFrame =
    Eav.inferTypes(p1EavExplode(s, dir), groupCols = Seq("attribute"))

  /** Fact build: EAV + inferred types -> tval_char / nval_num union type. */
  def eavObservationFact(s: SparkSession, dir: String): DataFrame =
    Eav.toObservationFact(p1EavExplode(s, dir), groupCols = Seq("attribute"))
      .select(col("c_custkey"), col("attribute"), col("valtype_cd"),
        col("tval_char"), round(col("nval_num"), 2).as("nval_num"))

  /** P7: fill-in-tree — materialize all ancestors of the leaf paths. */
  def p7FillInTree(s: SparkSession, dir: String): DataFrame =
    TreeOps.fillInTree(customerPaths(s, dir), "path")
      .select(col("c_fullname"), col("c_hlevel").cast("long").as("c_hlevel"), col("c_name"))

  /** A8: per-node distinct patient counts via ancestor explode (the
    * closure-join replacement). */
  def a8ConceptCounts(s: SparkSession, dir: String): DataFrame =
    TreeOps.conceptCounts(customerPaths(s, dir), "path", "c_custkey")

  /** A9: direct-children counts per node. */
  def a9ChildrenCounts(s: SparkSession, dir: String): DataFrame =
    TreeOps.childrenCounts(TreeOps.fillInTree(customerPaths(s, dir), "path"), "c_fullname")

  /** §2.9 path scalar pack: nth component, last component, hlevel,
    * kth-from-end instr — all as codegen'd Column expressions. */
  def fnPathScalars(s: SparkSession, dir: String): DataFrame =
    customerPaths(s, dir).select(
      col("path"),
      parseNthValue(col("path"), 2).as("nth2"),
      lastPathComponent(col("path")).as("last_component"),
      hlevel(col("path")).cast("long").as("hlevel"),
      instrFromEnd(col("path"), "\\", 2).cast("long").as("instr_2nd_from_end"))

  /** F1: fixColumn sanitizer chain on synthesized dirty strings. */
  def f1FixColumn(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      f1Dirty.as("dirty"),
      graft.functions.CleansingFunctions.fixColumn(f1Dirty).as("clean"))

  private def f1Dirty: Column =
    concat(lit("  \""), col("p_name"), lit(" *100% \\ & done\"  "))

  /** F2: ordered value-cleanup sweep on synthesized dirty values. */
  def f2ValueCleanup(s: SparkSession, dir: String): DataFrame = {
    val dirty = concat(lit("|"), regexp_replace(col("p_type"), " ", "_"),
      lit("+50%_done(plus),,|"))
    t(s, dir, "part").select(
      col("p_partkey"), dirty.as("dirty"),
      graft.functions.CleansingFunctions.cleanseValue(dirty).as("clean"))
  }

  /** F6: usubjid synthesis TRIAL:SITE:SUBJECT with :: collapse. */
  def f6Usubjid(s: SparkSession, dir: String): DataFrame = {
    val site = when(col("c_nationkey") % 2 === 0, lit(""))
      .otherwise(col("c_nationkey").cast("string"))
    t(s, dir, "customer").select(
      col("c_custkey"),
      usubjid(lit("TRIAL1"), site, col("c_name")).as("usubjid"))
  }
}

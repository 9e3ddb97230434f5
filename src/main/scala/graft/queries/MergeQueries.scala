package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.MergeModes

/** SURVEY §2.10 merge verbs under the oracle gate. The reference defines
  * them as in-place DML inside I2B2_LOAD_CLINICAL_DATA.sql (REPLACE
  * :846-870,936-947,1079-1121; UPDATE :1123-1166; APPEND :1284-1308;
  * UPDATE_VARIABLES :1168-1282); here each is a pure (oldFacts, newFacts)
  * -> facts rewrite from [[graft.operators.MergeModes]], exercised over
  * fact frames synthesized deterministically from `orders` so the DuckDB
  * oracle can recompute the merge independently.
  *
  * Scenario: the warehouse holds facts for STUDY_A (80% of patients) and
  * STUDY_B; a re-upload arrives for STUDY_A covering every 7th order with
  * refreshed values. All values are integers/strings — no FP anywhere.
  */
object MergeQueries {

  // Plain load: merge-mode plans are join/anti-join shapes on pruned
  // columns; the r6 blanket repartition only added an exchange.
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The warehouse fact table: one EAV-ish fact per order. */
  private def oldFacts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_custkey").cast("string").as("usubjid"),
      concat(lit("S/"), col("o_orderpriority")).as("leaf_node"),
      col("o_orderstatus").as("data_label"),
      when(col("o_orderkey") % 2 === 0, "N").otherwise("T").as("valtype_cd"),
      when(col("o_custkey") % 10 < 8, "STUDY_A").otherwise("STUDY_B")
        .as("sourcesystem_cd"),
      (col("o_orderkey") % 100).cast("long").as("nval"))

  /** The re-upload: STUDY_A patients, every 7th order, refreshed values. */
  private def newFacts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 7 === 0 && col("o_custkey") % 10 < 8)
      .select(
        col("o_custkey").cast("string").as("usubjid"),
        concat(lit("S/"), col("o_orderpriority")).as("leaf_node"),
        col("o_orderstatus").as("data_label"),
        when(col("o_orderkey") % 2 === 0, "N").otherwise("T").as("valtype_cd"),
        lit("STUDY_A").as("sourcesystem_cd"),
        (col("o_orderkey") % 100 + 1000).cast("long").as("nval"))

  def mergeReplace(s: SparkSession, dir: String): DataFrame =
    MergeModes.replace(oldFacts(s, dir), newFacts(s, dir), "STUDY_A")

  def mergeUpdate(s: SparkSession, dir: String): DataFrame =
    MergeModes.update(oldFacts(s, dir), newFacts(s, dir), "STUDY_A")

  def mergeAppend(s: SparkSession, dir: String): DataFrame =
    MergeModes.append(oldFacts(s, dir), newFacts(s, dir), "STUDY_A")

  /** Ontology nodes synthesized from region x nation for the move/delete
    * queries: one node per nation under its region's study root. */
  private def pathNodes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").cast("long").as("node_id"),
        concat(lit("\\Public Studies\\"), col("r_name"), lit("\\"),
          col("n_name"), lit("\\")).as("c_fullname"))

  /** Study move (I2B2_MOVE_STUDY_BY_PATH prefix rewrite + level renumber)
    * under the gate: the AMERICA subtree moves to a deeper archive path,
    * every other node keeps its path; hlevel recomputed from the result. */
  def studyMove(s: SparkSession, dir: String): DataFrame =
    MergeModes.moveStudy(pathNodes(s, dir), "c_fullname",
      "\\Public Studies\\AMERICA\\", "\\Archive\\2026\\AMERICA Moved\\")

  /** Study delete (J8 subtree predicate, I2B2_DELETE_ALL_DATA node sweep):
    * facts under the ASIA study root vanish, the rest survive. */
  def studyDelete(s: SparkSession, dir: String): DataFrame = {
    val facts = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey").cast("long").as("patient_num"),
        concat(lit("\\Public Studies\\"), col("r_name"), lit("\\"),
          col("n_name"), lit("\\")).as("leaf_node"))
    MergeModes.deleteStudy(facts, "\\Public Studies\\ASIA\\")
  }

  /** Two patterns, each matching exactly one of the five priority paths —
    * the reference's "replace single matching categorical subtree" rule. */
  def mergeUpdateVariables(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val patterns = Seq("^S/1-URGENT$", "^S/5-LOW$").toDF("pattern")
    val uvNew = newFacts(s, dir)
      .filter(col("leaf_node").isin("S/1-URGENT", "S/5-LOW"))
    MergeModes.updateVariables(oldFacts(s, dir), uvNew, patterns)
  }
}

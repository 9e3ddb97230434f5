package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge semantics as functional table rewrites (SURVEY §2.10): each mode
  * is a pure function (oldFacts, newFacts) -> facts. The reference does
  * in-place DML (delete+insert inside one transaction); here the new fact
  * table is recomputed and atomically published by the writer — the
  * idiomatic lakehouse equivalent, and the only sane shape at 100 TB
  * (no random-access deletes against columnar storage).
  *
  * Fact frames carry at least: usubjid, leaf_node, data_label, valtype_cd.
  * All joins are on those keys; the "new" side of every merge is one
  * study's upload (small vs the warehouse) so anti/semi joins broadcast.
  */
object MergeModes {

  /** REPLACE (I2B2_LOAD_CLINICAL_DATA.sql:846-870,936-947,1079-1121):
    * drop every old fact of this study, load the new ones. */
  def replace(oldFacts: DataFrame, newFacts: DataFrame, studyId: String): DataFrame =
    oldFacts.filter(col("sourcesystem_cd") =!= studyId)
      .unionByName(newFacts)

  /** UPDATE (SQL:1123-1166): drop old facts only for re-uploaded patients
    * of this study; keep other patients' facts. */
  def update(oldFacts: DataFrame, newFacts: DataFrame, studyId: String): DataFrame = {
    val reuploaded = newFacts.select(col("usubjid")).distinct()
    val keep = oldFacts.filter(col("sourcesystem_cd") =!= studyId)
      .unionByName(
        oldFacts.filter(col("sourcesystem_cd") === studyId)
          .join(broadcast(reuploaded), Seq("usubjid"), "left_anti"))
    keep.unionByName(newFacts)
  }

  /** APPEND (SQL:1284-1308): keep everything except NUMERIC facts for
    * updated patients at re-used nodes (those are refreshed); append new. */
  def append(oldFacts: DataFrame, newFacts: DataFrame, studyId: String): DataFrame = {
    val refreshedKeys = newFacts
      .filter(col("valtype_cd") === "N")
      .select(col("usubjid"), col("leaf_node")).distinct()
    val kept = oldFacts.filter(col("sourcesystem_cd") =!= studyId)
      .unionByName(
        oldFacts.filter(col("sourcesystem_cd") === studyId)
          .join(broadcast(refreshedKeys), Seq("usubjid", "leaf_node"), "left_anti"))
    kept.unionByName(newFacts)
  }

  /** UPDATE_VARIABLES (SQL:1168-1282, J10 set-based rewrite): each new
    * categorical variable names a path pattern; it must match EXACTLY ONE
    * existing concept path, whose subtree is replaced. Returns the merged
    * facts; throws on 0 or >1 matches like the reference's error path. */
  def updateVariables(oldFacts: DataFrame, newFacts: DataFrame,
                      patterns: DataFrame /* (pattern) regex over paths */): DataFrame = {
    val paths = oldFacts.select(col("leaf_node")).distinct()
    val matches = paths.crossJoin(broadcast(patterns))
      .filter(expr("leaf_node rlike pattern"))
    val counts = matches.groupBy(col("pattern")).agg(count(lit(1)).as("n"))
    val multi = counts.filter(col("n") =!= 1).count()
    val unmatched = patterns.distinct().count() - counts.count()
    require(multi == 0 && unmatched == 0,
      s"UPDATE_VARIABLES: $multi patterns match >1 path, $unmatched match none")
    val victims = matches.select(col("leaf_node")).distinct()
    oldFacts.join(broadcast(victims), Seq("leaf_node"), "left_anti")
      .unionByName(newFacts)
  }

  /** The FULL UPDATE_VARIABLES merge (SQL:1168-1282) — per (patient,
    * variable) victim selection, unlike [[updateVariables]]'s whole-path
    * form:
    *
    *  - each new TEXT row derives a regex from its leaf TEMPLATE (the
    *    leaf with DATAVALUE still unsubstituted): metacharacters escaped,
    *    DATAVALUE -> `[^\]+` (:1174-1177). It must match AT MOST ONE of
    *    that patient's existing concept paths; >1 is the reference's
    *    error path; 0 means nothing to delete
    *  - the matched path's SUBTREE is deleted for that patient only
    *  - each new NUMERIC row deletes that patient's facts at the exact
    *    template path
    *  - `protectedPaths` (omics sample-mapping concepts, :1199-1222)
    *    survive deletion; only this study's facts are eligible
    *
    * Scale: patterns join old paths on usubjid (hash join) with the rlike
    * as residual — the per-patient candidate sets are bounded by that
    * patient's distinct concept count. */
  def updateVariablesByPatient(oldFacts: DataFrame, newFacts: DataFrame,
                               studyId: String,
                               protectedPaths: Option[DataFrame] = None): DataFrame = {
    val pat = newFacts
      .select(col("usubjid"), col("leaf_template"), col("valtype_cd")).distinct()
    val tPat = pat.filter(col("valtype_cd") === "T")
      .withColumn("pattern", concat(lit("^"),
        org.apache.spark.sql.functions.replace( // MergeModes.replace shadows it
          regexp_replace(col("leaf_template"), "([\\[\\]\\(\\)\\\\])", "\\\\$1"),
          lit("DATAVALUE"), lit("[^\\\\]+")),
        lit("$")))

    val inStudy = oldFacts.filter(col("sourcesystem_cd") === studyId)
    val oldPaths = inStudy.select(col("usubjid"), col("leaf_node")).distinct()
    val matches = oldPaths
      .join(tPat.select(col("usubjid"), col("pattern")), Seq("usubjid"))
      .filter(expr("leaf_node rlike pattern"))
    val multi = matches.groupBy(col("usubjid"), col("pattern"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    require(multi == 0,
      s"UPDATE_VARIABLES: $multi (patient, variable) pairs match several categorical paths")

    // T: the matched path's subtree, per patient; N: the exact path
    val tVictims = inStudy.as("f")
      .join(matches.select(col("usubjid"), col("leaf_node").as("mpath")).distinct(),
        Seq("usubjid"))
      .filter(col("f.leaf_node").startsWith(col("mpath")))
      .select(col("usubjid"), col("f.leaf_node").as("leaf_node"))
    val nVictims = pat.filter(col("valtype_cd") =!= "T")
      .select(col("usubjid"), col("leaf_template").as("leaf_node"))
    val victims = protectedPaths match {
      case Some(p) => tVictims.unionByName(nVictims).distinct()
        .join(p.select(col("leaf_node")), Seq("leaf_node"), "left_anti")
      case None => tVictims.unionByName(nVictims).distinct()
    }

    oldFacts.filter(col("sourcesystem_cd") =!= studyId)
      .unionByName(inStudy.join(victims, Seq("usubjid", "leaf_node"), "left_anti"))
      .unionByName(newFacts.select(oldFacts.columns.map(col): _*))
  }

  /** Study delete (I2B2_DELETE_ALL_DATA.sql): subtree removal by path
    * prefix across the star tables — prefix filter, no join (J8). */
  def deleteStudy(facts: DataFrame, topNode: String): DataFrame =
    facts.filter(!col("leaf_node").startsWith(topNode))

  /** Study move (I2B2_MOVE_STUDY_BY_PATH.sql): path-prefix rewrite with
    * level renumber — a projection, not DML. */
  def moveStudy(nodes: DataFrame, pathCol: String,
                oldTop: String, newTop: String): DataFrame = {
    import graft.functions.PathFunctions._
    nodes.withColumn(pathCol,
      when(col(pathCol).startsWith(oldTop),
        concat(lit(newTop), col(pathCol).substr(lit(oldTop.length + 1), length(col(pathCol)))))
        .otherwise(col(pathCol)))
      .withColumn("c_hlevel", hlevel(col(pathCol)))
  }
}

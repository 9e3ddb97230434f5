package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PathFunctions._

/** Ontology-tree operators over materialized-path columns.
  *
  * The reference builds its tree with string-prefix machinery: ancestor
  * generation level-by-level (I2B2_FILL_IN_TREE.sql:52-99), a precomputed
  * transitive closure via prefix-LIKE self-joins bucketed by path length
  * (I2B2_CREATE_FULL_TREE.sql:54-82), and per-node patient counts /
  * children counts over that closure (I2B2_CREATE_CONCEPT_COUNTS.sql:79-102,
  * I2B2_LOAD_CLINICAL_DATA.sql:1432-1481).
  *
  * Spark-first rewrite: a path of depth d explodes into its d ancestor
  * prefixes; every subtree rollup becomes explode + hash aggregate — linear
  * in fact rows x depth, shuffles once on the node key, no theta join.
  * At 100 TB the closure join would be quadratic in paths; this scales as
  * a plain groupBy with map-side partial aggregation. Depth is bounded
  * (ontology trees are ~3-12 levels), so the explode factor is a small
  * constant.
  */
object TreeOps {

  /** Fill-in-tree: given leaf paths, materialize every node (all ancestors,
    * self included), one row per distinct node with its depth and name.
    * Ref: I2B2_FILL_IN_TREE.sql:52-99 (level-by-level loop -> one explode).
    */
  def fillInTree(leaves: DataFrame, pathCol: String): DataFrame =
    leaves
      .select(explode(ancestorPaths(col(pathCol))).as("c_fullname"))
      .distinct()
      .select(
        col("c_fullname"),
        hlevel(col("c_fullname")).as("c_hlevel"),
        lastPathComponent(col("c_fullname")).as("c_name"))

  /** Per-node distinct-entity counts over the whole subtree (concept_counts).
    * `facts` has one row per (path, entity); every fact contributes to each
    * of its ancestors. Ref: I2B2_CREATE_CONCEPT_COUNTS.sql:79-102.
    */
  def conceptCounts(facts: DataFrame, pathCol: String, entityCol: String): DataFrame =
    facts
      .select(explode(ancestorPaths(col(pathCol))).as("c_fullname"), col(entityCol).as("entity"))
      .groupBy(col("c_fullname"))
      .agg(countDistinct(col("entity")).as("patient_count"))

  /** Direct-children count per node (drives leaf-vs-folder visualattrs).
    * Ref: I2B2_LOAD_CLINICAL_DATA.sql:1432-1481 — closure join replaced by
    * parent-path derivation + groupBy. */
  def childrenCounts(nodes: DataFrame, pathCol: String): DataFrame = {
    val parentOf: Column = when(hlevel(col(pathCol)) > 1,
      concat(lit("\\"),
        array_join(slice(pathComponents(col(pathCol)), lit(1), hlevel(col(pathCol)) - 1), "\\"),
        lit("\\")))
    nodes
      .select(parentOf.as("parent_path"))
      .filter(col("parent_path").isNotNull)
      .groupBy(col("parent_path"))
      .agg(count(lit(1)).as("n_children"))
  }

  /** Visual attributes: FA (folder) when the node has children, LA (leaf)
    * otherwise — the recompute at I2B2_LOAD_CLINICAL_DATA.sql:1432-1481. */
  def visualAttrs(nodes: DataFrame, pathCol: String): DataFrame = {
    val kids = childrenCounts(nodes, pathCol)
    nodes.join(kids, nodes(pathCol) === kids("parent_path"), "left")
      .select(col(pathCol),
        when(col("n_children").isNotNull, lit("FA")).otherwise(lit("LA")).as("c_visualattributes"))
  }
}

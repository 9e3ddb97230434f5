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

  final case class NodeTables(conceptDimension: DataFrame, i2b2: DataFrame,
                              observationFact: DataFrame)

  /** Explicit node add (I2B2_ADD_NODES.sql:41-96): replace each listed
    * path — facts at the replaced nodes' basecodes are dropped, the
    * concept_dimension / i2b2 rows are rebuilt with folder ('FA')
    * attributes. Concept codes are md5(path) prefixes (the reference draws
    * nextval(concept_id); deterministic ids keep runs reproducible). */
  def addNodes(spark: org.apache.spark.sql.SparkSession, t: NodeTables,
               newPaths: Seq[String], trialId: Option[String]): NodeTables = {
    if (newPaths.isEmpty) return t
    import spark.implicits._
    val pathsDf = broadcast(newPaths.toDF("c_fullname"))
    val replacedCodes = broadcast(t.i2b2
      .join(pathsDf, Seq("c_fullname"), "left_semi")
      .select(col("c_basecode").as("concept_cd")).distinct())
    val fresh = newPaths.toDF("concept_path")
      .withColumn("concept_cd", substring(md5(col("concept_path")), 1, 16))
      .withColumn("name_char", lastPathComponent(col("concept_path")))
      .withColumn("sourcesystem_cd",
        trialId.map(lit(_)).getOrElse(lit(null).cast("string")))
    NodeTables(
      conceptDimension = t.conceptDimension
        .join(broadcast(pathsDf.withColumnRenamed("c_fullname", "concept_path")),
          Seq("concept_path"), "left_anti")
        .unionByName(fresh, allowMissingColumns = true),
      i2b2 = t.i2b2.join(pathsDf, Seq("c_fullname"), "left_anti")
        .unionByName(fresh.select(
          col("concept_path").as("c_fullname"),
          hlevel(col("concept_path")).as("c_hlevel"),
          col("name_char").as("c_name"),
          lit("FA").as("c_visualattributes"),
          col("concept_cd").as("c_basecode"),
          col("sourcesystem_cd")), allowMissingColumns = true),
      observationFact = t.observationFact
        .join(replacedCodes, Seq("concept_cd"), "left_anti"))
  }

  /** Hidden-node cleanup (I2B2_LOAD_CLINICAL_DATA.sql:1513-1524 +
    * I2B2_DELETE_1_NODE.sql): the reference loops i2b2_delete_1_node over
    * every node under topNode whose second visualattr char is 'H'; here
    * one set-based pass removes the hidden nodes' facts (via basecode),
    * concepts and metadata rows. */
  def deleteHiddenNodes(t: NodeTables, topNode: String): NodeTables = {
    val hidden = broadcast(t.i2b2
      .filter(col("c_fullname").startsWith(topNode) &&
        substring(col("c_visualattributes"), 2, 1) === "H")
      .select(col("c_fullname"), col("c_basecode")))
    deleteNodeSet(t, hidden)
  }

  /** Single-node delete (I2B2_DELETE_1_NODE.sql:59-131) — exact path. */
  def deleteNode(t: NodeTables, path: String): NodeTables = {
    if (path == null || path.isEmpty || path == "%") return t
    deleteNodeSet(t, broadcast(
      t.i2b2.filter(col("c_fullname") === path)
        .select(col("c_fullname"), col("c_basecode"))))
  }

  private def deleteNodeSet(t: NodeTables, victims: DataFrame): NodeTables =
    NodeTables(
      conceptDimension = t.conceptDimension.join(
        victims.select(col("c_fullname").as("concept_path")),
        Seq("concept_path"), "left_anti"),
      i2b2 = t.i2b2.join(victims.select(col("c_fullname")),
        Seq("c_fullname"), "left_anti"),
      observationFact = t.observationFact.join(
        victims.select(col("c_basecode").as("concept_cd")).distinct(),
        Seq("concept_cd"), "left_anti"))
}

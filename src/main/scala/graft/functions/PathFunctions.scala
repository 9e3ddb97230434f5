package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path algebra over `\`-delimited materialized-path strings — the ontology
  * tree encoding of the reference (concepts like `\Public Studies\GSE0\Vital\`).
  *
  * Reference semantics: path normalize + level derivation
  * (I2B2_LOAD_CLINICAL_DATA.sql:115-121), nth component
  * (parse_nth_value, I2B2_LOAD_CLINICAL_DATA.sql:178,198,785), last component
  * get/replace (GET_LAST_PATH_COMPONENT.sql:1-16,
  * REPLACE_LAST_PATH_COMPONENT.sql:1-14), hlevel (I2B2_GET_HLEVEL.sql:1-18),
  * ancestor generation (I2B2_FILL_IN_TREE.sql:52-99) and the transitive
  * closure (I2B2_CREATE_FULL_TREE.sql:21-82).
  *
  * Everything is pure `Column` expressions (whole-stage-codegen friendly —
  * no UDFs). The reference's prefix-LIKE closure self-join is deliberately
  * NOT reproduced: at scale a theta join over paths is quadratic; we explode
  * each path into its ancestor prefixes instead, turning subtree rollups
  * into equi-joins / groupBys (SURVEY §4).
  */
object PathFunctions {

  /** Collapse runs of `\`, convert `+` separators to `\`, ensure exactly one
    * leading and one trailing `\`. Ref: I2B2_LOAD_CLINICAL_DATA.sql:115,229,600-628. */
  def normalizePath(c: Column): Column = {
    val collapsed = regexp_replace(c, "\\\\{2,}", "\\\\")
    val led = when(collapsed.startsWith("\\"), collapsed).otherwise(concat(lit("\\"), collapsed))
    when(led.endsWith("\\"), led).otherwise(concat(led, lit("\\")))
  }

  /** Non-empty `\`-separated components of a (normalized) path. */
  def pathComponents(c: Column): Column =
    filter(split(c, "\\\\"), x => length(x) > 0)

  /** 1-based nth component — reference `parse_nth_value(path, n, '\')`. */
  def parseNthValue(c: Column, n: Int): Column =
    try_element_at(pathComponents(c), lit(n))

  /** Depth of the node = number of components (reference c_hlevel is this
    * minus a root offset applied at call sites; I2B2_GET_HLEVEL.sql). */
  def hlevel(c: Column): Column = size(pathComponents(c))

  /** Last path component — I2B2_GET_NODE_NAME.sql / GET_LAST_PATH_COMPONENT.sql. */
  def lastPathComponent(c: Column): Column = element_at(pathComponents(c), -1)

  /** Replace the last component — REPLACE_LAST_PATH_COMPONENT.sql. */
  def replaceLastPathComponent(c: Column, replacement: Column): Column =
    concat(
      lit("\\"),
      array_join(slice(pathComponents(c), lit(1), hlevel(c) - 1), "\\"),
      when(hlevel(c) > 1, lit("\\")).otherwise(lit("")),
      replacement, lit("\\"))

  /** All ancestor paths of a normalized path, shortest first, self included:
    * `\A\B\` -> [`\A\`, `\A\B\`]. The scalable replacement for the
    * reference's LIKE-prefix closure join (I2B2_CREATE_FULL_TREE.sql:54-82):
    * explode this array and equi-join/groupBy on the ancestor string.
    */
  def ancestorPaths(c: Column): Column = {
    val parts = pathComponents(c)
    transform(sequence(lit(1), size(parts)),
      i => concat(lit("\\"), array_join(slice(parts, lit(1), i), "\\"), lit("\\")))
  }

  /** Proper ancestors only (self excluded). */
  def properAncestorPaths(c: Column): Column =
    slice(ancestorPaths(c), lit(1), greatest(hlevel(c) - 1, lit(0)))

  /** Oracle-style `instr(s, sub, -1, k)`: position (1-based) of the kth
    * occurrence of `sub` counting from the end; 0 if absent.
    * Ref call sites: I2B2_LOAD_CLINICAL_DATA.sql:384-393,
    * I2B2_CREATE_CONCEPT_COUNTS.sql:86. */
  def instrFromEnd(s: Column, sub: String, k: Int): Column = {
    // Position of kth-from-end = length - length(substring_index-from-right) ... use
    // substring_index: take everything after removing the last k occurrences.
    // substring_index(s, sub, -(k)) returns the suffix after the kth-from-end
    // occurrence; position = length(s) - length(suffix) - length(sub) + 1.
    val suffix = substring_index(s, sub, -k)
    val occurrences = size(split(s, java.util.regex.Pattern.quote(sub), -1)) - 1
    when(occurrences < k, lit(0))
      .otherwise(length(s) - length(suffix) - lit(sub.length) + 1)
  }
}

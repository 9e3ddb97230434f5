package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CleansingFunctions

/** Entity-Attribute-Value operators — the clinical fact model.
  *
  * The reference explodes each wide clinical row into one row per mapped
  * (category, label) entry (ClinicalDataProcessor.groovy:83-158) landing as
  * observation_fact with a tval_char/nval_num union type
  * (I2B2_LOAD_CLINICAL_DATA.sql:1313-1356); numeric-vs-text is decided per
  * concept GROUP at load time via `having sum(is_numeric(v)) = 0`
  * (I2B2_LOAD_CLINICAL_DATA.sql:546-598).
  *
  * Spark-first: the wide->long explode is a generated `stack` (codegen'd,
  * no shuffle); type inference is one groupBy over the long table.
  */
object Eav {

  /** Explode chosen columns of a wide frame into (key..., attribute, value)
    * long format; values cast to string (the reference's untyped staging).
    * NULL values are dropped (empty-value delete, F2 / SQL:236-240). */
  def explodeToEav(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val stackArgs = attrCols
      .map(a => s"'$a', cast(`$a` as string)")
      .mkString(", ")
    df.select(keyCols.map(col) :+
        expr(s"stack(${attrCols.size}, $stackArgs) as (attribute, value)"): _*)
      .filter(CleansingFunctions.nonEmpty(col("value")))
  }

  /** A1 group-scoped type inference: an attribute group is Numeric iff NO
    * value in the group fails the numeric test (inverted is_numeric
    * semantics, I2B2_LOAD_CLINICAL_DATA.sql:546-575). */
  def inferTypes(eav: DataFrame, groupCols: Seq[String]): DataFrame =
    eav.groupBy(groupCols.map(col): _*)
      .agg(
        sum(CleansingFunctions.isNumericInverted(col("value"))).cast("long").as("non_numeric_count"),
        count(lit(1)).as("n_values"))
      .withColumn("inferred_type",
        when(col("non_numeric_count") === 0, lit("N")).otherwise(lit("T")))

  /** Split the EAV into typed fact columns: tval_char for text groups,
    * nval_num for numeric groups (fact build, SQL:1313-1356). */
  def toObservationFact(eav: DataFrame, groupCols: Seq[String]): DataFrame = {
    val types = inferTypes(eav, groupCols).select(
      groupCols.map(col) :+ col("inferred_type"): _*)
    eav.join(types, groupCols)
      .withColumn("valtype_cd", col("inferred_type"))
      .withColumn("tval_char", when(col("inferred_type") === "T", col("value"))
        .otherwise(lit("E")))
      .withColumn("nval_num", when(col("inferred_type") === "N",
        CleansingFunctions.tryCastDouble(col("value"))))
      .drop("inferred_type")
  }
}

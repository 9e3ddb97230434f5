package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CleansingFunctions.tryCastDouble
import graft.sources.ClinicalMapping.VariableType
import graft.sources.ValidationRules

/** The SummaryStatistic.txt emitter — the reference's golden per-variable
  * report (StatisticCollector.groovy:46-85, VariableStatistic.groovy:
  * 40-239; golden fixture ExpectedSummaryStatistic.txt). One row per
  * variable per file with:
  *
  *   File, Variable, Variable Type, N, null, Mean, Median, IQR, Min, Max,
  *   SD, Count, Required, Validation rule, QC missing data, QC data range
  *
  *  - numeric stats use the exact median / Tukey-hinges IQR semantics
  *    (half includes the middle element when n is odd), sample SD, all
  *    rounded to 6 dp like the reference's `.round(6)`
  *  - Count = categorical factor counts "value: n, ..."
  *  - QC missing data = "<k> missing ('id', ...)" for required variables
  *  - QC data range = "Range checks failed: <rule> ('id', ...); ..." /
  *    "OK" / "All values are empty"
  *
  * Id lists and factor counts are sorted (the reference emits first-seen
  * order; the golden fixture's lists are sorted, so the outputs agree).
  * Violated checks print in the reference's first-appearance order —
  * insertion-ordered map filled row-major, rules in declaration order
  * within a row — reproduced from (first violating row, rule index).
  *
  * Unparsable non-empty Numerical values count into the mean/SD divisors
  * (VariableStatistic.groovy:149-170 increments notEmptyValuesCount
  * BEFORE parsing, so the Welford divisors include them) and surface as a
  * `Type is Numerical` rule violation in QC data range — but, like the
  * reference (getQCRangeCheck), only when the variable also declares
  * range checks. The reference's running mean is stream-order dependent
  * when unparsable values interleave with parsable ones; we fix the
  * "unparsables first" order, under which the Welford recurrence closes
  * to mean = sum/notEmpty and sdBase = sumsq - sum^2/notEmpty.
  *
  * Spark shape: per file ONE aggregate pass computes every variable's
  * counts, moments, hinge array and violation-id lists (collect_list
  * drops nulls, so the `when` guards double as filters), plus one melted
  * groupBy for all categorical factor counts — two jobs per file
  * regardless of variable count.
  */
object SummaryStatistic {

  final case class VariableSpec(name: String, varType: VariableType,
                                rules: Seq[ValidationRules.Rule]) {
    // ID/SUBJ_ID variables are implicitly required (VariableStatistic:
    // required = type in [ID, SUBJ_ID] || rules contain Required)
    def required: Boolean =
      varType == VariableType.Id || varType == VariableType.SubjId ||
        rules.exists(_.check == ValidationRules.Required)
    def rangeRules: Seq[ValidationRules.Rule] =
      rules.filter(_.check != ValidationRules.Required)
  }

  val ReportColumns: Seq[String] = Seq("File", "Variable", "Variable Type",
    "N", "null", "Mean", "Median", "IQR", "Min", "Max", "SD", "Count",
    "Required", "Validation rule", "QC missing data", "QC data range")

  private def typeName(t: VariableType): String = t match {
    case VariableType.Id => "ID"
    case VariableType.SubjId => "SUBJ_ID"
    case VariableType.Text => "Text"
    case VariableType.Numerical => "Numerical"
    case VariableType.Categorical => "Categorical"
    case VariableType.Date => "Date"
    case VariableType.Timepoint => "Timepoint"
    case VariableType.Timestamp => "Timestamp"
  }

  private def medianOfSorted(xs: Seq[Double]): Double = {
    val n = xs.length
    if (n == 0) Double.NaN
    else if (n % 2 == 1) xs(n / 2)
    else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
  }

  /** Groovy double.round(6): HALF_UP at 6 dp, printed via Double.toString
    * (keeps "90.0", drops trailing zeros beyond one). */
  private def fmt6(d: Double): String =
    if (d.isNaN) ""
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble.toString

  private def idList(ids: Seq[String]): String =
    ids.map(i => s"'$i'").mkString(", ")

  /** Compute the report rows for one file's wide frame. `idCol` is the
    * subject-id column used in violation lists.
    *
    * PRECONDITION: `dfIn` must be the file as read (e.g. TsvReader.read),
    * NOT repartitioned or shuffled — the reference's first-appearance
    * violation ordering is file order, recovered here from
    * monotonically_increasing_id, which follows partition layout: split
    * order for a frame read straight from one file, arbitrary after a
    * shuffle. A caller that reorders the frame gets a nondeterministic
    * "Range checks failed" ordering. */
  def forFile(fileName: String, dfIn: DataFrame, idCol: String,
              vars: Seq[VariableSpec]): Seq[Row] = {
    def nonEmpty(c: Column) = length(coalesce(c, lit(""))) > 0
    val peer: String => Column = name => col(name)
    // file row order, for the reference's first-appearance violation
    // ordering (see the precondition above)
    val df = dfIn.withColumn("__row", monotonically_increasing_id())

    // --- single aggregate pass over the file
    var aggs = Vector[Column](count(lit(1)).as("__total"))
    vars.zipWithIndex.foreach { case (v, i) =>
      val value = col(v.name)
      aggs :+= sum(when(nonEmpty(value), 1L).otherwise(0L)).as(s"n_$i")
      if (v.varType == VariableType.Numerical) {
        val d = tryCastDouble(value)
        aggs :+= coalesce(sum(d), lit(0.0)).as(s"sum_$i")
        aggs :+= coalesce(sum(d * d), lit(0.0)).as(s"ssq_$i")
        aggs :+= min(d).as(s"min_$i")
        aggs :+= max(d).as(s"max_$i")
        aggs :+= sort_array(collect_list(d)).as(s"vals_$i")
        aggs :+= sort_array(collect_list(
          when(nonEmpty(value) && d.isNull, col(idCol)))).as(s"typeviol_$i")
        aggs :+= min(when(nonEmpty(value) && d.isNull, col("__row")))
          .as(s"typeviolrow_$i")
      }
      v.rules.zipWithIndex.foreach { case (r, j) =>
        val bad = ValidationRules.violates(r, value, peer)
        aggs :+= sort_array(collect_list(when(bad, col(idCol))))
          .as(s"viol_${i}_$j")
        aggs :+= min(when(bad, col("__row"))).as(s"violrow_${i}_$j")
      }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    // --- one melted pass for every categorical variable's factor counts
    val catVars = vars.filter(_.varType == VariableType.Categorical)
    val factorCounts: Map[String, Seq[(String, Long)]] =
      if (catVars.isEmpty) Map.empty
      else {
        val stacked = catVars.map(v => s"'${v.name}', `${v.name}`").mkString(", ")
        df.select(expr(s"stack(${catVars.size}, $stacked) as (__var, __val)"))
          .filter(nonEmpty(col("__val")))
          .groupBy(col("__var"), col("__val")).count()
          .collect()
          .groupBy(_.getString(0))
          .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2))
            .sortBy(_._1).toSeq).toMap
      }

    val total = row.getAs[Long]("__total")
    vars.zipWithIndex.map { case (v, i) =>
      val n = row.getAs[Long](s"n_$i")
      val nulls = total - n
      val (mean, median, iqr, mn, mx, sd) =
        if (v.varType == VariableType.Numerical && n > 0) {
          val vals = row.getAs[scala.collection.Seq[Double]](s"vals_$i").toSeq
          val h = (vals.length + 1) / 2
          val iqrV =
            if (vals.isEmpty) Double.NaN
            else medianOfSorted(vals.slice(vals.length - h, vals.length)) -
              medianOfSorted(vals.slice(0, h))
          // divisors use n = notEmptyValuesCount (incl. unparsable values),
          // matching the reference's Welford counters
          val sumV = row.getAs[Double](s"sum_$i")
          val ssqV = row.getAs[Double](s"ssq_$i")
          val sdV =
            if (n > 1) math.sqrt(math.max(0.0, ssqV - sumV * sumV / n) / (n - 1))
            else Double.NaN
          (fmt6(sumV / n), fmt6(medianOfSorted(vals)), fmt6(iqrV),
            if (vals.isEmpty) "" else fmt6(row.getAs[Double](s"min_$i")),
            if (vals.isEmpty) "" else fmt6(row.getAs[Double](s"max_$i")),
            fmt6(sdV))
        } else ("", "", "", "", "", "")

      val countStr =
        if (v.varType == VariableType.Categorical)
          factorCounts.getOrElse(v.name, Seq.empty)
            .map { case (value, c) => s"$value: $c" }.mkString(", ")
        else ""

      def violIds(j: Int): Seq[String] =
        row.getAs[scala.collection.Seq[String]](s"viol_${i}_$j").toSeq

      val missingIds = v.rules.zipWithIndex
        .filter(_._1.check == ValidationRules.Required)
        .flatMap { case (_, j) => violIds(j) }.sorted
      val qcMissing =
        if (!v.required) ""
        else if (nulls > 0) s"$nulls missing (${idList(missingIds)})"
        else "OK"

      val typeViolIds: Seq[String] =
        if (v.varType == VariableType.Numerical)
          row.getAs[scala.collection.Seq[String]](s"typeviol_$i").toSeq
        else Seq.empty
      // first-appearance ordering: the reference's violatedRangeChecks is
      // an insertion-ordered map filled row-major, rules in declaration
      // order within a row — reproduce via (first violating row, rule idx);
      // the type check runs during value collection, before range rules
      val ranged = v.rules.zipWithIndex
        .filter(_._1.check != ValidationRules.Required)
        .flatMap { case (r, j) =>
          val ids = violIds(j)
          if (ids.isEmpty) None
          else Some((row.getAs[Long](s"violrow_${i}_$j"), j,
            s"${r.source} (${idList(ids)})"))
        } ++
        (if (typeViolIds.nonEmpty)
          Seq((row.getAs[Long](s"typeviolrow_$i"), -1,
            s"Type is Numerical (${idList(typeViolIds)})"))
        else Seq.empty)
      val violatedRanges = ranged.sortBy(t => (t._1, t._2)).map(_._3)
      val qcRange =
        if (n == 0) "All values are empty"
        else if (v.rangeRules.isEmpty) ""
        else if (violatedRanges.isEmpty) "OK"
        else s"Range checks failed: ${violatedRanges.mkString("; ")}"

      Row(fileName, v.name, typeName(v.varType), n, nulls,
        mean, median, iqr, mn, mx, sd, countStr,
        if (v.required) "Yes" else "",
        v.rangeRules.map(_.source).mkString("; "),
        qcMissing, qcRange)
    }
  }

  /** Assemble the full report frame for several files and write it as the
    * tab-separated SummaryStatistic.txt (S8 sink). */
  def report(spark: SparkSession,
             files: Seq[(String, DataFrame, String, Seq[VariableSpec])]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(ReportColumns.map {
      case c @ ("N" | "null") => StructField(c, LongType)
      case c => StructField(c, StringType)
    })
    val rows = files.flatMap { case (name, df, idCol, vars) =>
      forFile(name, df, idCol, vars)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  def write(spark: SparkSession, path: String,
            files: Seq[(String, DataFrame, String, Seq[VariableSpec])]): Unit =
    graft.sources.TsvReader.writeTsv(report(spark, files), path)
}

package graft.sources

import org.apache.spark.sql.SparkSession

/** The clinical mapping file — the dynamic input-schema driver
  * (ClinicalDataMapping.groovy:24-44 Entry, parse at :69-189).
  *
  * Tab-separated columns: filename, category_cd, col_nbr (1-based),
  * data_label, data_label_source, variable_type, validation_rules
  * [, baseline]. Semantics carried over:
  *  - data_label `OMIT` -> column skipped
  *  - data_label `\` -> label taken from the column named by
  *    data_label_source `\d+(A|B)` (A: label before value path component,
  *    B: after)
  *  - category_cd is a `+`-separated path that may contain the
  *    placeholders DATALABEL / VISITNAME / DATAVALUE and `$$TAG` /
  *    `$${TAG}` references to other columns (TagReplacer.groovy:57-112)
  *  - merge mode arrives as a `# MERGE_MODE: X` meta header
  *    (ClinicalDataProcessor.groovy:210-218)
  *
  * Parsed driver-side (the mapping file is tiny); it configures the
  * distributed plan, it is not data.
  */
object ClinicalMapping {

  sealed trait VariableType
  object VariableType {
    case object Id extends VariableType
    case object SubjId extends VariableType
    case object Text extends VariableType
    case object Numerical extends VariableType
    case object Categorical extends VariableType
    case object Date extends VariableType
    case object Timepoint extends VariableType
    case object Timestamp extends VariableType
    def parse(s: String): Option[VariableType] = Option(s).map(_.trim.toUpperCase).collect {
      case "ID" => Id
      case "SUBJ_ID" => SubjId
      case "TEXT" => Text
      case "NUMERICAL" => Numerical
      case "CATEGORICAL" => Categorical
      case "DATE" => Date
      case "TIMEPOINT" => Timepoint
      case "TIMESTAMP" => Timestamp
    }
  }

  sealed trait MergeMode
  object MergeMode {
    case object Replace extends MergeMode
    case object Update extends MergeMode
    case object Append extends MergeMode
    case object UpdateVariables extends MergeMode
    def parse(s: String): MergeMode = s.trim.toUpperCase match {
      case "UPDATE" => Update
      case "APPEND" => Append
      case "UPDATE_VARIABLES" => UpdateVariables
      case _ => Replace
    }
  }

  /** One mapping row. `baseline` names the DATA_LABEL of the column whose
    * per-row value is this variable's timestamp baseline
    * (ClinicalDataMapping.groovy:32-33,125-126,161-168). */
  final case class Entry(
      filename: String,
      categoryCd: String,
      colNbr: Int,
      dataLabel: String,
      dataLabelSource: Option[(Int, String)], // (1-based col, "A"|"B")
      variableType: Option[VariableType],
      validationRules: Seq[ValidationRules.Rule],
      baseline: Option[String] = None)

  final case class Mapping(entries: Seq[Entry], mergeMode: MergeMode) {
    def forFile(filename: String): Seq[Entry] = entries.filter(_.filename == filename)
    def files: Seq[String] = entries.map(_.filename).distinct
  }

  private val DataLabelSourceRx = "^(\\d+)(A|B)?$".r

  def load(spark: SparkSession, path: String): Mapping = {
    val meta = TsvReader.metaHeader(spark, path)
    val rows = TsvReader.read(spark, path).collect()
    val cols = TsvReader.header(spark, path).map(_.toLowerCase)
    def cell(r: org.apache.spark.sql.Row, name: String): String = {
      val i = cols.indexOf(name)
      if (i < 0 || r.isNullAt(i)) "" else r.getString(i)
    }
    val entries = rows.toSeq.flatMap { r =>
      val label = cell(r, "data_label")
      val colNbr = cell(r, "col_nbr")
      if (label.equalsIgnoreCase("OMIT") || colNbr.isEmpty) None
      else Some(Entry(
        filename = cell(r, "filename"),
        categoryCd = cell(r, "category_cd"),
        colNbr = colNbr.toInt,
        dataLabel = label,
        dataLabelSource = cell(r, "data_label_source") match {
          case DataLabelSourceRx(n, pos) => Some((n.toInt, Option(pos).getOrElse("A")))
          case _ => None
        },
        variableType = VariableType.parse(cell(r, "variable_type")),
        validationRules = ValidationRules.parse(cell(r, "validation_rules")),
        baseline = Some(cell(r, "baseline")).filter(_.nonEmpty)))
    }
    Mapping(entries, MergeMode.parse(meta.getOrElse("MERGE_MODE", "REPLACE")))
  }

  /** Mapping-file discovery (ClinicalDataProcessor.groovy:185-197): files
    * matching `*_Mapping_File.txt` (case-insensitive, exact suffix — the
    * wrong-name fixture's `..._Mapping_File...txt` must NOT match). Empty
    * result carries the reference's error message. */
  def findMappingFiles(dir: java.nio.file.Path): Either[String, Seq[java.nio.file.Path]] = {
    import scala.jdk.CollectionConverters._
    val rx = "(?i).+_Mapping_File\\.txt$".r
    val found =
      if (!java.nio.file.Files.isDirectory(dir)) Seq.empty
      else java.nio.file.Files.list(dir).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          rx.matches(p.getFileName.toString))
        .toSeq.sortBy(_.getFileName.toString)
    if (found.isEmpty) Left("Mapping file wasn't found. Please, check file name.")
    else Right(found)
  }

  /** F7 validations (ClinicalDataMapping.groovy:69-189): column indices in
    * range, duplicate mapped columns flagged, category_cd length bound. */
  def validate(m: Mapping, fileColumnCounts: Map[String, Int],
               maxCategoryLen: Int = 250): Seq[String] = {
    val oob = m.entries.flatMap { e =>
      fileColumnCounts.get(e.filename) match {
        case Some(n) if e.colNbr < 1 || e.colNbr > n =>
          Some(s"${e.filename}: col_nbr ${e.colNbr} out of 1..$n")
        case None => Some(s"${e.filename}: file not found")
        case _ => None
      }
    }
    val dups = m.entries.groupBy(e => (e.filename, e.colNbr)).collect {
      case ((f, c), es) if es.size > 1 => s"$f: column $c mapped ${es.size} times"
    }
    val longCats = m.entries.collect {
      case e if e.categoryCd.length > maxCategoryLen =>
        s"${e.filename}: category_cd longer than $maxCategoryLen"
    }
    oob ++ dups ++ longCats
  }
}

/** The validation-rules DSL (statistic/ValidationRule.groovy:32-155,
  * ValueRange.groovy:13-22): `required`, ranges (`>x`, `>=x`, `<x`, `<=x`,
  * `between a to b`, `a-b`), each optionally conditioned with
  * `, when "Field" is <cond>` (present / absent / equal to "v").
  */
object ValidationRules {

  sealed trait Condition
  case object Always extends Condition
  final case class WhenPresent(field: String) extends Condition
  final case class WhenAbsent(field: String) extends Condition
  final case class WhenEquals(field: String, value: String) extends Condition

  sealed trait Check
  case object Required extends Check
  final case class Range(min: Option[Double], minInclusive: Boolean,
                         max: Option[Double], maxInclusive: Boolean) extends Check

  /** `source` keeps the rule's original DSL text — the report emitter
    * prints it verbatim (the reference's rule `description`). */
  final case class Rule(check: Check, condition: Condition, source: String = "")

  private val WhenRx = """(?i)\s*,\s*when\s+"([^"]+)"\s+is\s+(.*)$""".r.unanchored
  private val EqRx = """(?i)equal\s+to\s+"([^"]+)"""".r
  private val GtRx = """^>\s*(-?[\d.]+)$""".r
  private val GeRx = """^>=\s*(-?[\d.]+)$""".r
  private val LtRx = """^<\s*(-?[\d.]+)$""".r
  private val LeRx = """^<=\s*(-?[\d.]+)$""".r
  private val BetweenRx = """(?i)^between\s+(-?[\d.]+)\s+to\s+(-?[\d.]+)$""".r
  private val DashRx = """^(-?[\d.]+)\s*-\s*(-?[\d.]+)$""".r

  def parse(s: String): Seq[Rule] =
    if (s == null || s.trim.isEmpty) Seq.empty
    else s.split(";").toSeq.map(_.trim).filter(_.nonEmpty).flatMap(parseOne)

  private def parseOne(s: String): Option[Rule] = {
    val (body, cond) = s match {
      case WhenRx(field, rest) =>
        val c = rest.trim match {
          case r if r.equalsIgnoreCase("present") => WhenPresent(field)
          case r if r.equalsIgnoreCase("absent") => WhenAbsent(field)
          case EqRx(v) => WhenEquals(field, v)
          case _ => Always
        }
        (s.substring(0, s.toLowerCase.indexOf(", when")).trim, c)
      case _ => (s.trim, Always)
    }
    val check: Option[Check] = body match {
      case b if b.equalsIgnoreCase("required") => Some(Required)
      case GeRx(x) => Some(Range(Some(x.toDouble), true, None, true))
      case GtRx(x) => Some(Range(Some(x.toDouble), false, None, true))
      case LeRx(x) => Some(Range(None, true, Some(x.toDouble), true))
      case LtRx(x) => Some(Range(None, true, Some(x.toDouble), false))
      case BetweenRx(a, b) => Some(Range(Some(a.toDouble), true, Some(b.toDouble), true))
      case DashRx(a, b) => Some(Range(Some(a.toDouble), true, Some(b.toDouble), true))
      case _ => None
    }
    check.map(Rule(_, cond, s))
  }

  /** Compile a rule to a boolean violation Column over (value, peers). */
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import graft.functions.CleansingFunctions.tryCastDouble

  def violates(rule: Rule, value: Column, peer: String => Column): Column = {
    val active: Column = rule.condition match {
      case Always => lit(true)
      case WhenPresent(f) => length(coalesce(peer(f), lit(""))) > 0
      case WhenAbsent(f) => length(coalesce(peer(f), lit(""))) === 0
      case WhenEquals(f, v) => coalesce(peer(f), lit("")) === v
    }
    val bad: Column = rule.check match {
      case Required => length(coalesce(value, lit(""))) === 0
      case Range(mn, mni, mx, mxi) =>
        val v = tryCastDouble(value)
        val lo = mn.map(m => if (mni) v < m else v <= m).getOrElse(lit(false))
        val hi = mx.map(m => if (mxi) v > m else v >= m).getOrElse(lit(false))
        v.isNotNull && (lo || hi)
    }
    active && bad
  }
}

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

  final case class Mapping(entries: Seq[Entry], mergeMode: MergeMode,
                           parseErrors: Seq[String] = Nil) {
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
    // malformed rows collect errors the way the reference's mappingErrors
    // do (ClinicalDataMapping.groovy:86-151) — surfaced via validate()
    val parseErrors = scala.collection.mutable.ArrayBuffer.empty[String]
    val entries = rows.toSeq.flatMap { r =>
      val label = cell(r, "data_label")
      val colNbr = cell(r, "col_nbr")
      val rowTxt = cols.map(cell(r, _)).mkString("[", ", ", "]")
      if (label.equalsIgnoreCase("OMIT") || label == "DATA_LABEL") None
      else if (colNbr.isEmpty || !colNbr.matches("\\d+")) {
        parseErrors += s"Invalid or empty column index '$colNbr' for row: $rowTxt"
        None
      } else if (label == "\\" && cell(r, "category_cd").isEmpty) {
        parseErrors += "CATEGORY_CD wasn't specified for variable with " +
          s"DATA_LABEL_SOURCE for row: $rowTxt"
        None
      } else if (label == "\\" &&
          !DataLabelSourceRx.matches(cell(r, "data_label_source"))) {
        parseErrors += s"Invalid data_label_source " +
          s"'${cell(r, "data_label_source")}' for row: $rowTxt"
        None
      } else Some(Entry(
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
    Mapping(entries, MergeMode.parse(meta.getOrElse("MERGE_MODE", "REPLACE")),
      parseErrors.toSeq)
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

  private val TagRx = "\\$\\$(\\{[^}]+\\}|[^+]+)".r
  private val SpecialLabels =
    Set("STUDY_ID", "SITE_ID", "SUBJ_ID", "VISIT_NAME", "SAMPLE_ID")

  /** F7 validations (ClinicalDataMapping.groovy:86-168, TagReplacer
    * .groovy:58-86), reference messages: parse errors from load, column /
    * label-source indices in range, referenced data file exists,
    * category_cd length bound, `$$` tags resolve to a mapped DATA_LABEL or
    * special column. Duplicate mapped columns are a WARNING in the
    * reference (the load proceeds) — see [[warnings]]. */
  def validate(m: Mapping, fileColumnCounts: Map[String, Int],
               maxCategoryLen: Int = 250): Seq[String] = {
    val oob = m.entries.flatMap { e =>
      fileColumnCounts.get(e.filename) match {
        case Some(n) if e.colNbr < 1 || e.colNbr > n =>
          Some(s"Column index '${e.colNbr}' is out of bounds of data file " +
            s"columns (1-$n) for row: ${e.filename}/${e.dataLabel}")
        case None => Some(s"File '${e.filename}' doesn't exists")
        case _ => None
      }
    }
    val dlsOob = m.entries.flatMap { e =>
      (e.dataLabelSource, fileColumnCounts.get(e.filename)) match {
        case (Some((src, _)), Some(n)) if src < 1 || src > n =>
          Some(s"Data label source column index '$src' is out of bounds of " +
            s"data file columns (1-$n) for row: ${e.filename}/${e.categoryCd}")
        case _ => None
      }
    }
    val longCats = m.entries.collect {
      case e if e.categoryCd.length > maxCategoryLen =>
        s"CATEGORY_CD is too long (${e.categoryCd.length} > $maxCategoryLen) " +
          s"for row: ${e.filename}/${e.dataLabel}"
    }
    val badTags = m.files.flatMap { f =>
      val labels = m.forFile(f).map(_.dataLabel.toUpperCase).toSet ++ SpecialLabels
      m.forFile(f).flatMap { e =>
        TagRx.findAllMatchIn(e.categoryCd).map(_.group(1)).map { raw =>
          if (raw.startsWith("{") && raw.endsWith("}"))
            raw.substring(1, raw.length - 1)
          else raw
        }.filterNot(t => labels.contains(t.toUpperCase)).map(t =>
          s"$f: cat_cd '${e.categoryCd}' contains not-existing tag: '$t'")
      }
    }
    m.parseErrors ++ oob ++ dlsOob ++ longCats ++ badTags
  }

  /** Duplicate mapped columns — a warning, not an error: the reference
    * logs and loads both variables off the shared column. */
  def warnings(m: Mapping): Seq[String] =
    m.entries.groupBy(e => (e.filename, e.colNbr)).collect {
      case ((f, c), es) if es.size > 1 =>
        s"Column index '$c' is already mapped in other row ($f)"
    }.toSeq
}

/** The validation-rules DSL (statistic/ValidationRule.groovy:32-155,
  * ValueRange.groovy:13-22): `required`, ranges in symbol (`>x`, `>=x`,
  * `<x`, `<=x`) and verbal (`Greater than x`, `Greater than or equal to x`,
  * `Lesser than [or equal to] x`) forms plus `between a to b` / `a-b`,
  * each optionally conditioned with `, when "Field" is <cond>` where the
  * condition is itself a range, `present`, `blank`, or
  * `[not] equal(s) to "v"`. Unparseable rules are ignored, like the
  * loader's warn-and-skip. */
object ValidationRules {

  sealed trait Condition
  case object Always extends Condition
  final case class WhenPresent(field: String) extends Condition
  final case class WhenAbsent(field: String) extends Condition
  final case class WhenEquals(field: String, value: String,
                              negated: Boolean = false) extends Condition
  final case class WhenInRange(field: String, range: Range) extends Condition

  sealed trait Check
  case object Required extends Check
  final case class Range(min: Option[Double], minInclusive: Boolean,
                         max: Option[Double], maxInclusive: Boolean) extends Check

  /** `source` keeps the rule's original DSL text — the report emitter
    * prints it verbatim (the reference's rule `description`). */
  final case class Rule(check: Check, condition: Condition, source: String = "")

  private val WhenRx = """(?is)^\s*(.*)\s*,\s+when\s+"([^"]+)"\s+is\s+(.*)$""".r
  private val EqRx = """(?i)^(not\s+)?equals?\s+to\s+"([^"]*)"$""".r
  // verbal/symbol forms in the reference's match order (>= before >)
  private val GeRx = """(?i)^(?:greater than or equal to\s+|>=)\s*(.+)$""".r
  private val GtRx = """(?i)^(?:greater than\s+|>)\s*(.+)$""".r
  private val LeRx = """(?i)^(?:lesser than or equal to\s+|<=)\s*(.+)$""".r
  private val LtRx = """(?i)^(?:lesser than\s+|<)\s*(.+)$""".r
  private val BetweenRx = """(?i)^between\s+(.+?)\s+to\s+(.+)$""".r
  private val DashRx = """^(.+?)-(.+)$""".r

  private def num(s: String): Option[Double] =
    try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }

  /** The shared range grammar (valueRangeFactory order), two-level like
    * the reference: the STRING-level pattern match happens before numeric
    * conversion. Returns None when no pattern matches; Some(None) when a
    * pattern matched syntactically but a bound is not numeric (the
    * reference logs and hard-drops — NumberFormatException paths at
    * ValidationRule.groovy:73-77,149-153). */
  private def parseRangeCond(body: String): Option[Option[Range]] = body match {
    case GeRx(x) => Some(num(x).map(v => Range(Some(v), true, None, true)))
    case GtRx(x) => Some(num(x).map(v => Range(Some(v), false, None, true)))
    case LeRx(x) => Some(num(x).map(v => Range(None, true, Some(v), true)))
    case LtRx(x) => Some(num(x).map(v => Range(None, true, Some(v), false)))
    case BetweenRx(a, b) =>
      Some(for (x <- num(a); y <- num(b)) yield Range(Some(x), true, Some(y), true))
    case DashRx(a, b) =>
      Some(for (x <- num(a); y <- num(b)) yield Range(Some(x), true, Some(y), true))
    case _ => None
  }

  private def parseRange(body: String): Option[Range] =
    parseRangeCond(body).flatten

  def parse(s: String): Seq[Rule] =
    if (s == null || s.trim.isEmpty) Seq.empty
    else s.split(";").toSeq.map(_.trim).filter(_.nonEmpty).flatMap(parseOne)

  private def parseOne(s: String): Option[Rule] = {
    val (body, cond: Option[Condition]) = s match {
      case WhenRx(rule, field, rest) =>
        // parseRuleCondition order (ValidationRule.groovy:70-90): the RANGE
        // grammar first — a syntactic range match whose bound is not
        // numeric drops the whole rule, even if it would read as an
        // equality (e.g. `equal to "Follow-up"`: the dash pattern claims
        // it) — then presence, blank, equality
        val c: Option[Condition] = rest.trim match {
          case r if parseRangeCond(r).isDefined =>
            parseRange(r).map(WhenInRange(field, _))
          case r if r.equalsIgnoreCase("present") => Some(WhenPresent(field))
          // the reference's absence pattern is a PREFIX match on 'blank';
          // 'absent' kept as this engine's historical alias
          case r if r.toLowerCase.startsWith("blank") ||
            r.equalsIgnoreCase("absent") => Some(WhenAbsent(field))
          case EqRx(not, v) => Some(WhenEquals(field, v, negated = not != null))
          case _ => None
        }
        // an unparseable condition drops the whole rule (warn-and-skip)
        if (c.isEmpty) return None
        (rule.trim, c)
      case _ => (s.trim, Some(Always))
    }
    val check: Option[Check] =
      if (body.equalsIgnoreCase("required")) Some(Required)
      else parseRange(body)
    check.map(Rule(_, cond.get, s))
  }

  /** Compile a rule to a boolean violation Column over (value, peers). */
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import graft.functions.CleansingFunctions.tryCastDouble

  /** A value is INSIDE the range (condition semantics). */
  private def inRange(v: Column, r: Range): Column = {
    val okLo = r.min.map(m => if (r.minInclusive) v >= m else v > m)
      .getOrElse(lit(true))
    val okHi = r.max.map(m => if (r.maxInclusive) v <= m else v < m)
      .getOrElse(lit(true))
    v.isNotNull && okLo && okHi
  }

  def violates(rule: Rule, value: Column, peer: String => Column): Column = {
    val active: Column = rule.condition match {
      case Always => lit(true)
      case WhenPresent(f) => length(coalesce(peer(f), lit(""))) > 0
      case WhenAbsent(f) => length(coalesce(peer(f), lit(""))) === 0
      case WhenEquals(f, v, negated) =>
        val eq = coalesce(peer(f), lit("")) === v
        if (negated) !eq else eq
      case WhenInRange(f, r) => inRange(tryCastDouble(peer(f)), r)
    }
    val bad: Column = rule.check match {
      case Required => length(coalesce(value, lit(""))) === 0
      case r @ Range(_, _, _, _) =>
        val v = tryCastDouble(value)
        v.isNotNull && !inRange(v, r)
    }
    active && bad
  }
}

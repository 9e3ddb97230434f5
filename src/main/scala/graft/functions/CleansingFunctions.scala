package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-cleansing column expressions mirroring the reference's sanitizers.
  * All pure `Column` chains (codegen'd regexp/translate — no UDFs), so they
  * survive predicate pushdown and stay inside WholeStageCodegen at scale.
  */
object CleansingFunctions {

  /** `fixColumn` — reference ClinicalDataProcessor.groovy:335-347:
    * trim; strip surrounding double quotes; drop `\`; `%` -> `PCT`;
    * drop `*`; `&` -> ` and `; strip non-ASCII.
    */
  def fixColumn(c: Column): Column = {
    val t = trim(c)
    val unq = when(t.startsWith("\"") && t.endsWith("\"") && length(t) >= 2,
      trim(t.substr(lit(2), length(t) - 2))).otherwise(t)
    val noBs = regexp_replace(unq, "\\\\", "")
    val pct = regexp_replace(noBs, "%", "PCT")
    val noStar = regexp_replace(pct, "\\*", "")
    val amp = regexp_replace(noStar, "&", " and ")
    regexp_replace(amp, "[^\\x00-\\x7F]", "")
  }

  /** Value cleanup sweep — reference I2B2_LOAD_CLINICAL_DATA.sql:236-474,
    * in the reference's sequential order (the sweeps do not commute):
    * trim `|` from both ends, then `|` -> `-`; `%` -> ` Pct`; `&`/`+` ->
    * ` and `; `_` -> space; collapse doubled spaces; trim trailing commas;
    * final trim.
    */
  def cleanseValue(c: Column): Column = {
    val pipeTrim = regexp_replace(regexp_replace(c, "^\\|+", ""), "\\|+$", "")
    val pipeDash = regexp_replace(pipeTrim, "\\|", "-")
    val pct = regexp_replace(pipeDash, "%", " Pct")
    val amp = regexp_replace(pct, "[&+]", " and ")
    // '(plus)' survives the '+' sweep and restores AFTER it (SQL:440);
    // values keep their underscores — only labels sweep '_' to space
    val plus = replace(amp, lit("(plus)"), lit("+"))
    val sp = regexp_replace(plus, " {2,}", " ")
    val comma = regexp_replace(sp, ",+$", "")
    trim(comma)
  }

  /** Rows with empty/NULL data_value are deleted before cleansing
    * (I2B2_LOAD_CLINICAL_DATA.sql:236-240). */
  def nonEmpty(c: Column): Column = length(coalesce(c, lit(""))) > 0

  /** data_label cleansing sweep (I2B2_LOAD_CLINICAL_DATA.sql:434-459):
    * `%` -> ' Pct', `&` and `+` -> ' and ', `_` -> space, `(plus)` -> `+`,
    * then space collapse / trims / trailing-comma trim. NULL stays NULL. */
  def cleanseLabel(c: Column): Column = {
    val repl = replace(replace(replace(replace(replace(c,
      lit("%"), lit(" Pct")), lit("&"), lit(" and ")), lit("+"), lit(" and ")),
      lit("_"), lit(" ")), lit("(plus)"), lit("+"))
    regexp_replace(
      trim(regexp_replace(regexp_replace(repl, " {2,}", " "), " ,", ",")),
      ",+$", "")
  }

  /** usubjid synthesis `TRIAL:SITE:SUBJECT` with `::` collapse when SITE is
    * empty — I2B2_LOAD_CLINICAL_DATA.sql:230-231. */
  def usubjid(trial: Column, site: Column, subject: Column): Column =
    regexp_replace(
      concat_ws(":", coalesce(trial, lit("")), coalesce(site, lit("")), coalesce(subject, lit(""))),
      ":{2,}", ":")

  /** Regex accepted as "numeric" — shared verbatim with the DuckDB oracle SQL
    * so both engines gate the cast identically. */
  val NumericRegex = "^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"

  /** ANSI-safe string->double: regex-gated cast (NULL when non-numeric).
    * The CaseWhen only evaluates the cast on matching rows, so this is safe
    * under spark.sql.ansi.enabled=true and stays codegen'd. */
  def tryCastDouble(c: Column): Column =
    when(c.rlike(NumericRegex), c.cast("double"))

  /** Inverted numeric test of the reference's `is_numeric`: 0 when castable
    * to numeric, 1 otherwise (I2B2_LOAD_CLINICAL_DATA.sql:562,813-815). */
  def isNumericInverted(c: Column): Column =
    when(tryCastDouble(c).isNotNull, lit(0)).otherwise(lit(1))
}

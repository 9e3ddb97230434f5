package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/timepoint functions.
  *
  * Reference: TIMESTAMP_TO_TIMEPOINT.sql:1-76 — the diff of two
  * 'YYYY-MM-DD HH24:MI:SS' strings rendered as a human timepoint label:
  * negative diffs get a leading '-', zero becomes 'Baseline', otherwise
  * 'D days H hours M minutes S seconds' with singular/plural forms and
  * zero components omitted (the function's yearValue is never assigned, so
  * no year component is ever emitted — days can exceed 365).
  *
  * Implemented as pure Column expressions (codegen'd, no UDF) over a
  * whole-second diff.
  */
object TimeFunctions {

  /** Render a signed whole-second difference as the reference's timepoint
    * label. Null-propagating: a null diff (unparseable timestamp) yields
    * null, not '' — callers' isNotNull fallback guards rely on this. */
  def timepointLabel(diffSeconds: Column): Column = {
    val neg = diffSeconds < 0
    val secs = abs(diffSeconds)
    val d = (secs / 86400L).cast("long")
    val h = ((secs % 86400L) / 3600L).cast("long")
    val m = ((secs % 3600L) / 60L).cast("long")
    val sec = (secs % 60L).cast("long")

    def comp(v: Column, unit: String): Column =
      when(v =!= 0,
        concat(v.cast("string"), lit(" " + unit), when(v > 1, lit("s ")).otherwise(lit(" "))))
        .otherwise(lit(""))

    val prefix = when(diffSeconds === 0, lit("Baseline"))
      .otherwise(when(neg, lit("-")).otherwise(lit("")))
    when(diffSeconds.isNotNull,
      trim(concat(prefix,
        comp(d, "day"), comp(h, "hour"), comp(m, "minute"), comp(sec, "second"))))
  }

  /** Reference-parity API: 'yyyy-MM-dd HH:mm:ss' strings; Postgres'
    * to_timestamp tolerates missing seconds ('2000-12-31 12:00'), so both
    * shapes parse (try_to_timestamp keeps the fallback ANSI-safe). */
  def timestampToTimepoint(tsValue: Column, baselineValue: Column): Column = {
    def ts(c: Column) = coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm")))
    val diff = unix_timestamp(ts(tsValue)) - unix_timestamp(ts(baselineValue))
    timepointLabel(diff)
  }
}

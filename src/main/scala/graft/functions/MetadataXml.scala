package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ValueMetadata XML builder — I2B2_BUILD_METADATA_XML.sql:1-76.
  *
  * TIMEPOINT concepts get a SeriesMeta block whose value is the display
  * name converted to minutes ('Baseline' -> 0; 'Week -3' -> -30240;
  * '2 days 4 hours' -> interval minutes); plain numeric concepts get the
  * static PosFloat template (verbatim from the reference, including its
  * stray '100' text node — byte-parity with the original output matters
  * more than XML taste). Non-numeric, non-timepoint -> NULL.
  *
  * Pure functions + a Column wrapper; the per-unit minute factors follow
  * the reference exactly (month = 30 days, year = 12 x 30 days).
  */
object MetadataXml {

  private[graft] val Template =
    "<?xml version=\"1.0\"?><ValueMetadata><Version>3.02</Version>" +
    "<CreationDateTime>08/14/2008 01:22:59</CreationDateTime><TestID></TestID>" +
    "<TestName></TestName><DataType>PosFloat</DataType><CodeType></CodeType>" +
    "<Loinc></Loinc><Flagstouse></Flagstouse><Oktousevalues>Y</Oktousevalues>" +
    "<MaxStringLength></MaxStringLength><LowofLowValue>0</LowofLowValue>" +
    "<HighofLowValue>0</HighofLowValue><LowofHighValue>100</LowofHighValue>100" +
    "<HighofHighValue>100</HighofHighValue><LowofToxicValue></LowofToxicValue>" +
    "<HighofToxicValue></HighofToxicValue><EnumValues></EnumValues>" +
    "<CommentsDeterminingExclusion><Com></Com></CommentsDeterminingExclusion>" +
    "<UnitValues><NormalUnits>ratio</NormalUnits><EqualUnits></EqualUnits>" +
    "<ExcludingUnits></ExcludingUnits><ConvertingUnits><Units></Units>" +
    "<MultiplyingFactor></MultiplyingFactor></ConvertingUnits></UnitValues>" +
    "<Analysis><Enums /><Counts /><New /></Analysis>"

  private val unitMinutes: Map[String, Double] = Map(
    "minute" -> 1, "minutes" -> 1,
    "hour" -> 60, "hours" -> 60,
    "day" -> 1440, "days" -> 1440,
    "week" -> 10080, "weeks" -> 10080,
    "month" -> 43200, "months" -> 43200,
    "year" -> 518400, "years" -> 518400)

  private val UnitFirst = "^[a-zA-Z]+ -?\\d+.*".r
  private val IntervalRx = "(-?\\d{1,4})\\s+(week|weeks|minute|minutes|hour|hours|day|days|year|years|month|months)".r

  /** Timepoint display name -> minutes; None when unparseable ("Check date
    * format" error path in the reference). */
  def timepointMinutes(displayName: String): Option[Double] = {
    val d = displayName.trim
    if (d == "Baseline") Some(0.0)
    else if (UnitFirst.matches(d.toLowerCase)) {
      // 'Week -3' form: unit word first, then the number
      val num = "-?\\d+".r.findFirstIn(d).map(_.toDouble)
      val unit = "[a-zA-Z]+".r.findFirstIn(d).map(_.toLowerCase)
      for { n <- num; u <- unit } yield n * unitMinutes.getOrElse(u, 1.0)
    } else {
      // '2 days 4 hours' interval form
      val parts = IntervalRx.findAllMatchIn(d.toLowerCase).toSeq
      if (parts.isEmpty) None
      else Some(parts.map(m => m.group(1).toDouble * unitMinutes(m.group(2))).sum)
    }
  }

  private def fmt(v: Double): String =
    if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString

  /** Reference-parity scalar (display_name, data_type, valuetype_cd). */
  def buildMetadataXml(displayName: String, dataType: String,
                       valuetypeCd: String): Option[String] =
    if (valuetypeCd == "TIMEPOINT")
      timepointMinutes(displayName).map { mins =>
        Template +
          s"<SeriesMeta><Value>${fmt(mins)}</Value><Unit>minutes</Unit>" +
          s"<DisplayName>$displayName</DisplayName></SeriesMeta></ValueMetadata>"
      }
    else if (dataType == "N") Some(Template + "</ValueMetadata>")
    else None

  /** Column wrapper (UDF — string templating, off the hot path). */
  val buildMetadataXmlUdf =
    udf((d: String, t: String, v: String) => buildMetadataXml(d, t, v).orNull)

  def metadataXml(displayName: Column, dataType: Column, valuetypeCd: Column): Column =
    buildMetadataXmlUdf(displayName, dataType, valuetypeCd)
}

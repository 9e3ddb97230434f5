package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tab-separated reader with the reference's CsvLikeFile semantics
  * (CsvLikeFile.groovy:28-166, utils/SkipLinesReader.groovy):
  *
  *  - `#`-prefixed lines are comments; `# KEY: value` lines double as
  *    metadata (MetaInfoHeader) and are exposed via [[metaHeader]]
  *  - header row = first non-comment line; duplicate header names are
  *    mangled `name@idx` (CsvLikeFile.groovy:105-119)
  *  - inconsistent rows are repaired: short rows padded with nulls, long
  *    rows accepted only when the extra cells are empty
  *    (CsvLikeFile.groovy:134-158)
  *  - malformed UTF-8 is replaced, not fatal (PERMISSIVE text read)
  *
  * Spark-first shape: `spark.read.text` + one codegen'd split/transform
  * pass — fully distributed, no driver parsing of data rows. Only the
  * header (one line) is read driver-side. At 100 TB the text scan
  * parallelizes by file split exactly like the csv source.
  */
object TsvReader {

  /** Key-value pairs from `# KEY: value` comment lines (driver-side scan
    * of the file head — meta headers precede data by construction). */
  def metaHeader(spark: SparkSession, path: String): Map[String, String] = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => l.startsWith("#"))
      .take(1000)
      .flatMap { l =>
        val body = l.dropWhile(_ == '#').trim
        val i = body.indexOf(':')
        if (i > 0) Some(body.substring(0, i).trim -> body.substring(i + 1).trim) else None
      }.toMap
  }

  /** The header columns, duplicate names mangled `name@idx` (1-based col
    * position, matching the reference's mangling). */
  def header(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    val first = spark.read.textFile(path)
      .filter(l => !l.startsWith("#") && l.trim.nonEmpty)
      .first()
    mangle(first.split("\t", -1).map(c => unquoteCell(c.trim)))
  }

  private def mangle(raw: Array[String]): Seq[String] = {
    val counts = raw.groupBy(identity).view.mapValues(_.length).toMap
    raw.zipWithIndex.map { case (name, i) =>
      if (counts(name) > 1) s"$name@${i + 1}" else name
    }.toSeq
  }

  /** TDF quoting (CsvLikeFile wraps commons-csv CSVFormat.TDF): a cell
    * wrapped in double quotes is unwrapped and `""` unescapes to `"`. */
  def unquoteCell(s: String): String =
    if (s != null && s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
      s.substring(1, s.length - 1).replace("\"\"", "\"")
    else s

  /** Read the file into a DataFrame of strings with repaired rows.
    * `strict=false` drops irreparable rows (extra non-empty cells);
    * `strict=true` fails the load on them, like the reference's
    * IllegalStateException.
    *
    * Only the FIRST non-comment line is the header: a legitimate data row
    * that happens to equal the header line survives (the reference skips
    * by position, not by content — CsvLikeFile.groovy:121-133). The header
    * row is identified by the minimum `monotonically_increasing_id` (file
    * order: partition index is split order, ids ascend within a split),
    * costing one head scan + one min-aggregate — two driver jobs total. */
  def read(spark: SparkSession, path: String, strict: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .filter(l => !l.startsWith("#") && l.trim.nonEmpty)
    // first() on an empty Dataset throws a bare NoSuchElementException
    // deep inside a load — name the actual problem instead
    val headerLine = lines.take(1).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"$path has no header row (empty or all-comment file)"))
    val cols = mangle(headerLine.split("\t", -1).map(c => unquoteCell(c.trim)))
    val n = cols.size

    val withId = lines.withColumn("__mid", monotonically_increasing_id())
    val headerId = withId.agg(min(col("__mid"))).first().getLong(0)

    val parsed: Dataset[Option[Seq[String]]] = withId
      .filter(col("__mid") =!= headerId)
      .select(col("value")).as[String]
      .map { line =>
        val cells = line.split("\t", -1).map(c => unquoteCell(c.trim)).toSeq
        if (cells.size == n) Some(cells)
        else if (cells.size < n) Some(cells ++ Seq.fill(n - cells.size)(null: String))
        else if (cells.drop(n).forall(c => c == null || c.isEmpty)) Some(cells.take(n))
        else None // irreparable: extra non-empty cells
      }

    if (strict) {
      val bad = parsed.filter(_.isEmpty).count()
      require(bad == 0, s"$bad rows with extra non-empty cells in $path")
    }
    val rows = parsed.flatMap(identity).toDF("cells")
    cols.zipWithIndex.foldLeft(rows) { case (df, (c, i)) =>
      df.withColumn(c, col("cells").getItem(i))
    }.drop("cells")
  }

  /** The reference's non-visual-symbol guard (SkipLinesReader.groovy:
    * 109-115): its UTF-8 decoder REPLACES malformed bytes with U+FFFD and
    * then fails the load when any replacement char appears in the stream —
    * this covers both the "non-UTF8 symbols" and the "non visual symbols
    * in header" fixtures. Returns the reference's message with ~100 chars
    * of context, or None when the file is clean. */
  def validateVisual(spark: SparkSession, path: String): Option[String] = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => l.indexOf('�') >= 0)
      .take(1).headOption.map { l =>
        val i = l.indexOf('�')
        val ctx = l.substring(math.max(0, i - 100), math.min(l.length, i + 100))
        s"In this:\n $ctx \nfound non visual symbol."
      }
  }

  /** Plain permissive TSV via the native csv source (fast path when the
    * file is known-regular): comment skip + header, Spark handles splits. */
  def readFast(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S8: tab-separated report sink (SummaryStatistic.txt / duplicates.csv
    * shape — ClinicalDataProcessor.groovy:199-201,301-331). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      // commons-csv TDF semantics: embedded quotes double ("" not \"),
      // empty cells stay truly empty (Spark's default writes "")
      .option("escape", "\"").option("emptyValue", "")
      .csv(path)
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native VCF source (files/VcfFile.groovy:1-220 semantics):
  *
  *  - `##`-meta lines parsed driver-side; `##INFO=<ID=..,Number=..,Type=..>`
  *    declarations typed Integer/Float/Flag/Character/String
  *    (VcfFile.groovy:34-47,204-213)
  *  - `#CHROM POS ID REF ALT QUAL FILTER INFO FORMAT s1 s2 ...` header:
  *    fixed columns + per-sample genotype columns
  *  - per-sample GT split `a/b` or `a|b` (VcfFile.groovy:122-141),
  *    `.` = missing; multi-alt `,`-split; multi-rsId `;`-split (:58-64)
  *
  * The data path is `spark.read.text` + codegen'd split expressions: the
  * scan parallelizes by file split, nothing is parsed on the driver except
  * the bounded meta header.
  */
object VcfReader {

  final case class InfoField(id: String, number: String, tpe: String,
                             description: String = "")

  private val InfoRx =
    """##INFO=<ID=([^,>]+),Number=([^,>]+),Type=([^,>]+)(?:,Description="([^"]*)")?.*>""".r.unanchored

  /** Parse the `##INFO` declarations (driver-side, bounded head scan). */
  def infoFields(spark: SparkSession, path: String): Seq[InfoField] = {
    import spark.implicits._
    spark.read.textFile(path).filter(l => l.startsWith("##")).take(5000)
      .toSeq.collect { case InfoRx(id, num, tpe, desc) =>
        InfoField(id, num, tpe, Option(desc).getOrElse(""))
      }
  }

  /** Sample ids from the `#CHROM` header line (columns after FORMAT).
    * A file without that header fails with an error naming the file —
    * never a bare NoSuchElementException (fuzz contract, like TsvReader). */
  def samples(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    val header = spark.read.textFile(path)
      .filter(l => l.startsWith("#") && !l.startsWith("##")).take(1)
    require(header.nonEmpty, s"VCF file has no #CHROM header line: $path")
    header(0).split("\t").drop(9).toSeq
  }

  /** Variants: one row per VCF data line with fixed columns + a
    * `sample_values` array aligned with [[samples]]. Fuzz contract: a
    * malformed cell (non-numeric / overflowing POS) becomes null — under
    * ANSI mode a plain cast would throw out of the scan task, so every
    * data-driven cast in this reader is a try_cast or regex-guarded. */
  def variants(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rows = spark.read.textFile(path).filter(l => !l.startsWith("#"))
    // get(), not getItem(): a short (ragged) data line would otherwise
    // throw INVALID_ARRAY_INDEX from the scan task under ANSI mode;
    // get() nulls the missing fields instead (fuzz contract)
    def f(i: Int): Column = get(col("c"), lit(i))
    rows.select(split(col("value"), "\t").as("c"))
      .select(
        f(0).as("chrom"),
        expr("try_cast(c[1] AS bigint)").as("pos"),
        f(2).as("rs_id"),
        f(3).as("ref"),
        f(4).as("alt"),
        f(5).as("qual"),
        f(6).as("filter"),
        f(7).as("info"),
        f(8).as("format"),
        slice(col("c"), lit(10), greatest(size(col("c")) - 9, lit(0))).as("sample_values"))
  }

  /** P4: per-sample explode — genotype alleles matched with the
    * reference's pattern `(\d+|\.)(?:([/|])(\d+|\.))?` (VcfFile.groovy:
    * 129-134 — separator and second allele only when the full pair
    * matches); allele indices resolved R(ef)/V(ariant); `.` missing.
    * SNV iff the REF and the SINGLE alternative are one base each
    * (VCFDataProcessor.groovy:203-204 — multi-alt rows are DIV even when
    * every alternative is one base). rs_id `;`-explode. */
  def explodeSamples(variants: DataFrame, sampleIds: Seq[String]): DataFrame = {
    val withSample = variants
      .select(col("*"),
        posexplode(col("sample_values")).as(Seq("sample_idx", "sample_value")))
      // try_element_at: a ragged data line with MORE sample cells than the
      // header declares indexes past the id list — null id, not a throw;
      // the filter then drops those identity-less cells (extra columns
      // are ignored, the header is the authority on sample arity)
      .withColumn("sample_id",
        try_element_at(array(sampleIds.map(lit): _*), col("sample_idx") + 1))
      .filter(col("sample_id").isNotNull)
      // GT located via FORMAT; a FORMAT without GT leaves gt null (the
      // reference builds NO sample data at all then — VcfFile.groovy:125)
      .withColumn("gt_idx",
        array_position(split(col("format"), ":"), "GT").cast("int"))
      .withColumn("gt", when(col("gt_idx") > 0,
        try_element_at(split(col("sample_value"), ":"), col("gt_idx"))))
      .withColumn("allele1", regexp_extract(col("gt"), "^(\\d+|\\.)", 1))
      .withColumn("allele_sep",
        regexp_extract(col("gt"), "^(?:\\d+|\\.)([/|])(?:\\d+|\\.)", 1))
      .withColumn("allele2",
        regexp_extract(col("gt"), "^(?:\\d+|\\.)[/|](\\d+|\\.)", 1))
    withSample
      .withColumn("alts", split(col("alt"), ","))
      .withColumn("variant1", alleleValue(col("allele1"), col("ref"), col("alts")))
      .withColumn("variant2", alleleValue(col("allele2"), col("ref"), col("alts")))
      .withColumn("variant_type",
        when(length(col("ref")) === 1 && size(col("alts")) === 1 &&
          length(element_at(col("alts"), 1)) === 1, lit("SNV")).otherwise(lit("DIV")))
      .drop("sample_values", "gt_idx", "alts")
  }

  /** Bounded-digit guard before an int cast: an allele index beyond 9
    * digits is garbage, and under ANSI mode an unguarded cast of it would
    * throw from the scan task; the guard nulls it instead. */
  private def safeIdx(c: Column): Column =
    when(c.rlike("^[0-9]{1,9}$"), c.cast("int"))

  /** Allele index -> sequence: 0 = REF, n = nth ALT, "." = null. */
  private def alleleValue(idx: Column, ref: Column, alts: Column): Column =
    when(idx === "." || length(coalesce(idx, lit(""))) === 0, lit(null).cast("string"))
      .when(idx === "0", ref)
      .otherwise(try_element_at(alts, safeIdx(idx)))

  /** rs_id `;`-explode (one row per probeset id, VcfFile.groovy:58-64). */
  def explodeRsIds(df: DataFrame): DataFrame =
    df.withColumn("probeset_id", explode(split(col("rs_id"), ";")))

  /** de_variant_subject_summary rows with the reference's R/V encoding
    * (VCFDataProcessor.groovy:201-254):
    *
    *  - per allele: '0' contributes (REF sequence, 'R'); a positive index
    *    contributes (ALT[i-1], 'V'); '.' contributes nothing
    *  - diploid genotypes join the two contributions with the original
    *    separator ('/' or '|') in BOTH variant and variantFormat, so
    *    './.' yields variant "/" and format "/"
    *  - haploid: single contribution, no separator
    *  - reference flag: every present allele is 0 ('.' counts as absent;
    *    a haploid '.' is NOT reference)
    *  - one row per sample per probeset id (rs_id `;`-explode)
    *  - a variant whose FORMAT lacks GT contributes NO rows (the
    *    reference's samplesData map stays empty — VcfFile.groovy:125-127,
    *    asserted by its own test at pos 16050624)
    */
  def subjectSummary(variants: DataFrame, sampleIds: Seq[String],
                     trialId: String): DataFrame = {
    val e = explodeRsIds(explodeSamples(variants, sampleIds))
      .filter(col("gt").isNotNull)
    val alts = split(col("alt"), ",")
    // bounded digits: an unbounded ^[0-9]+$ admits indices that overflow
    // the ANSI int cast below and throw from the task (fuzz finding)
    def isNum(a: Column) = a.rlike("^[0-9]{1,9}$")
    def vPart(a: Column): Column =
      when(a === "0", col("ref"))
        .when(isNum(a), coalesce(try_element_at(alts, a.cast("int")), lit("")))
        .otherwise(lit(""))
    def fPart(a: Column): Column =
      when(a === "0", lit("R")).when(isNum(a), lit("V")).otherwise(lit(""))
    def refOrMissing(a: Column): Column = !isNum(a) || a === "0"
    val a1 = coalesce(col("allele1"), lit(""))
    val a2 = coalesce(col("allele2"), lit(""))
    val haploid = coalesce(col("allele_sep"), lit("")) === ""
    e.withColumn("variant",
        when(haploid, vPart(a1))
          .otherwise(concat(vPart(a1), col("allele_sep"), vPart(a2))))
      .withColumn("variant_format",
        when(haploid, fPart(a1))
          .otherwise(concat(fPart(a1), col("allele_sep"), fPart(a2))))
      .withColumn("reference",
        when(haploid, a1 === "0")
          .otherwise(refOrMissing(a1) && refOrMissing(a2)))
      .withColumn("allele1_num", when(isNum(a1), a1.cast("int")))
      .withColumn("allele2_num", when(isNum(a2), a2.cast("int")))
      .select(
        lit(trialId).as("trial_name"), col("sample_id"), col("probeset_id"),
        col("chrom"), col("pos"), col("variant"), col("variant_format"),
        col("variant_type"), col("reference"),
        col("allele1_num").as("allele1"), col("allele2_num").as("allele2"))
  }

  /** P5: INFO explode — declared fields x value index -> typed rows
    * (VCFDataProcessor.groovy:168-199). A bare flag gets value "1", but a
    * flag written `FLAG=0` keeps its explicit value (VcfFile.groovy:
    * 150-157 splits on '=' first and only defaults absent values);
    * Integer AND Flag land in int_value, Float in float_value,
    * Character/String in text_value (the processor's type switch at
    * :177-190 cases Flag together with Integer). */
  def explodeInfo(df: DataFrame, fields: Seq[InfoField]): DataFrame = {
    // a file with NO well-formed ##INFO declarations explodes an empty,
    // VOID-typed array — analysis error; the correctly-shaped empty
    // frame is the meaningful answer
    if (fields.isEmpty)
      return df.select(col("chrom"), col("pos"), col("rs_id"),
        lit(null).cast("string").as("info_id"),
        lit(null).cast("string").as("info_type"),
        lit(null).cast("int").as("value_idx"),
        lit(null).cast("string").as("value"),
        lit(null).cast("long").as("int_value"),
        lit(null).cast("double").as("float_value"),
        lit(null).cast("string").as("text_value"))
        .filter(lit(false))
    // per-field regex extraction, NOT str_to_map: a duplicated key (e.g.
    // the documented `DB;DB=0` flag form, or fuzz soup like `;=;`) makes
    // str_to_map throw DUPLICATED_MAP_KEY from the scan task; the regex
    // takes the first occurrence and ignores the rest. IDs are quoted —
    // a declaration id containing regex metachars must match literally,
    // never turn into a PatternSyntaxException at task time.
    val perField = fields.map { f =>
      val q = java.util.regex.Pattern.quote(f.id)
      val kv = regexp_extract(col("info"), s"(?:^|;)$q=([^;]*)", 1)
      val hasKv = col("info").rlike(s"(?:^|;)$q=")
      val bare = col("info").rlike(s"(?:^|;)$q(?:;|$$)")
      val raw =
        if (f.tpe == "Flag") when(hasKv, kv).otherwise(when(bare, lit("1")))
        else when(hasKv, kv)
      struct(lit(f.id).as("info_id"), lit(f.tpe).as("info_type"),
        raw.as("raw"))
    }
    df.select(col("chrom"), col("pos"), col("rs_id"),
        explode(array(perField: _*)).as("f"))
      .select(col("chrom"), col("pos"), col("rs_id"),
        col("f.info_id"), col("f.info_type"), col("f.raw"))
      .filter(col("raw").isNotNull)
      .select(col("*"), posexplode(split(col("raw"), ",")).as(Seq("value_idx", "value")))
      // try_cast: INFO values are user data — `DP=abc` must become a null
      // int_value, not an ANSI CAST_INVALID_INPUT thrown from the scan
      .withColumn("int_value",
        when(col("info_type").isin("Integer", "Flag"),
          expr("try_cast(value AS bigint)")))
      .withColumn("float_value",
        when(col("info_type") === "Float", expr("try_cast(value AS double)")))
      .withColumn("text_value",
        when(col("info_type").isin("Character", "String"), col("value")))
      .drop("raw")
  }
}

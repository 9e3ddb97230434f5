package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Omics input sources: expression-matrix melt (S6/P2), platform
  * annotation files (S3), study metadata (S9), PLINK binary (S5).
  */
object OmicsSources {

  /** S6/P2: wide probe matrix (ID_REF + one column per sample id) melted
    * to long (probeset_id, sample_id, intensity), empty cells skipped
    * (ExpressionDataProcessor.groovy:214-239). The melt is a generated
    * `stack` — codegen'd, no shuffle; the downstream groupBys shuffle on
    * the probe key only. The data-type suffix `_Data_[RLTZ]` of the file
    * name rides along as `data_type`. */
  def meltMatrix(matrix: DataFrame, idCol: String = "ID_REF",
                 dataType: String = "R"): DataFrame = {
    val sampleCols = matrix.columns.filterNot(_ == idCol)
    require(sampleCols.nonEmpty,
      s"matrix has no sample columns besides '$idCol' (stack needs >= 1)")
    // sample ids are user-authored header cells: escape the SQL literal
    // quote and the identifier backtick or the generated stack() breaks
    val stackArgs = sampleCols
      .map(c => s"'${c.replace("'", "''")}', " +
        s"cast(`${c.replace("`", "``")}` as string)").mkString(", ")
    matrix
      .select(col(idCol).as("probeset_id"),
        expr(s"stack(${sampleCols.length}, $stackArgs) as (sample_id, raw_value)"))
      .filter(length(coalesce(col("raw_value"), lit(""))) > 0)
      // try_cast: a non-numeric cell nulls ITS intensity (the raw value
      // survives for audit) instead of throwing from the scan under ANSI
      .withColumn("intensity_value", col("raw_value").try_cast("double"))
      .withColumn("data_type", lit(dataType))
  }

  /** Protein matrix melt (ProteinDataProcessor.groovy:184-207): column 0
    * is the peptide; when it is literally named PEPTIDE the next column is
    * the majority-protein id and samples start at column 2, otherwise the
    * file has no peptide column and samples start at column 1
    * (`havePeptide`). Key rides out as `probeset_id` like every melt. */
  def meltProtein(matrix: DataFrame, dataType: String = "R"): DataFrame = {
    val havePeptide = matrix.columns.head.toUpperCase == "PEPTIDE"
    val sampleCols = matrix.columns.drop(if (havePeptide) 2 else 1)
    meltMatrix(matrix.select(matrix.columns.head, sampleCols: _*),
      idCol = matrix.columns.head, dataType = dataType)
  }

  /** RBM long-format data file (RBMDataProcessor.groovy:186-208): columns
    * by POSITION — 2 = SAMPID, 5 = ANALYTE (with its `(unit)` suffix),
    * 7 = AVALUE; the header is sanity-checked; rows with any of the three
    * empty are dropped. Output matches the melt shape so the probe-avg /
    * z-score chain downstream is shared. */
  def readRbmLong(df: DataFrame, dataType: String = "R"): DataFrame = {
    val cols = df.columns
    require(cols.length > 7 &&
      (cols(2).toUpperCase == "SAMPID" ||
        cols(5).toUpperCase.contains("ANALYTE") ||
        cols(7).toUpperCase == "AVALUE"),
      s"Incorrect RBM data file: ${cols.take(8).mkString(", ")}")
    df.select(
        col(cols(5)).as("probeset_id"),
        col(cols(2)).as("sample_id"),
        col(cols(7)).as("raw_value"))
      .filter(length(coalesce(col("probeset_id"), lit(""))) > 0 &&
        length(coalesce(col("sample_id"), lit(""))) > 0 &&
        length(coalesce(col("raw_value"), lit(""))) > 0)
      .withColumn("intensity_value", col("raw_value").try_cast("double"))
      .withColumn("data_type", lit(dataType))
  }

  /** File-name convention `..._Data_R.txt` -> data type letter
    * (ExpressionDataProcessor.groovy:56). */
  def dataTypeFromFileName(name: String): String = {
    val rx = ".*_Data_([RLTZ])\\b.*".r
    name match { case rx(t) => t; case _ => "R" }
  }

  /** S3: platform annotation file — `# PLATFORM_*` meta headers + fuzzy
    * column detection by regex over the header (GplFile.groovy,
    * GexPlatform.groovy:47-82). Returns (meta, normalized annotation DF
    * with probeset_id / gene_symbol / gene_id / species). */
  def readPlatform(spark: SparkSession, path: String,
                   useFirstGeneId: Boolean = false): (Map[String, String], DataFrame) = {
    val meta = TsvReader.metaHeader(spark, path)
    val df = TsvReader.read(spark, path)
    // pattern priority (not column order): earlier patterns are the more
    // specific per-datatype keys
    def find(rxs: String*): Option[String] =
      rxs.view.flatMap(rx => df.columns.find(_.toUpperCase.matches(rx)))
        .headOption
    // per-datatype key columns (platforms/*.groovy eachEntry regexes):
    // RNASeq 'Transcript ID', miRNA 'SN_ID'/'MIRNA_ID', protein keyed on
    // PEPTIDE (always column 0, ProteinPlatform.groovy:62-66) with
    // '(Majority) Protein ID(s)' as the uniprot id, RBM 'Antigen Name'
    // with a 'uniprot' column, metabolomics 'HMDB_ID' with 'BIOCHEMICAL'
    // as the display symbol
    val probeset = find("^ID(_REF)?$", "^PROBE(SET)?(_ID)?$",
      "^(TRANSCRIPT[ _]*)?ID$", "^SN[ _]?ID$", "^(MIRNA[ _]*)?ID$",
      "^PEPTIDE$", "^(MAJORITY[ _]*)?(PROTEIN[ _]*)?IDS?$",
      "^ANTIGEN[ _]?NAME$", "^HMDB[ _]?ID$").getOrElse(df.columns.head)
    val symbol = find("^GENE[ _]?SYMBOL$", "^SYMBOL$", "^MIRNA[ _]*ID$",
      "^BIOCHEMICAL$")
    val geneId = find("^ENTREZ[ _]?GENE[ _]?ID$", "^GENE[ _]?ID$")
    val species = find("^SPECIES.*", "^ORGANISM$")
    val uniprot = find("^UNIPROT([ _]?ID)?$",
      "^(MAJORITY[ _]*)?(PROTEIN[ _]*)?IDS?$").filter(_ != probeset)
    // gene-keyed (GEX) normalization, GexPlatform.groovy:67-74 +
    // PlatformProcessor.normalizeGeneIdAndSymbol: by default a multi-valued
    // ENTREZ_GENE_ID row ('123 /// 456') is DROPPED entirely; with
    // useFirstGeneId the first number wins and the gene symbol is truncated
    // at '///' too; a symbol with no word character collapses to ''
    val base = geneId match {
      case Some(g) if !useFirstGeneId =>
        df.filter(coalesce(col(g), lit("")) === "" || col(g).rlike("^\\d+$"))
      case _ => df
    }
    val geneIdCol = geneId.map { g =>
      val normalized =
        if (useFirstGeneId) regexp_replace(trim(col(g)), " *//+.*", "")
        else col(g)
      when(normalized.rlike("^\\d+$"), normalized.cast("long"))
    }.getOrElse(lit(null).cast("long"))
    val symbolCol = symbol.map { s =>
      val truncated =
        if (useFirstGeneId && geneId.isDefined)
          // the reference truncates the symbol only when the id changed
          when(regexp_replace(trim(col(geneId.get)), " *//+.*", "")
              =!= col(geneId.get),
            regexp_replace(col(s), " *//+.*", "")).otherwise(col(s))
        else col(s)
      if (geneId.isDefined)
        when(truncated.rlike("\\w"), truncated).otherwise(lit(""))
      else truncated
    }.getOrElse(lit(null).cast("string"))
    val out = base.select(
      col(probeset).as("probeset_id"),
      symbolCol.as("gene_symbol"),
      uniprot.map(col).getOrElse(lit(null).cast("string")).as("uniprot_id"),
      geneIdCol.as("gene_id"),
      species.map(col).getOrElse(lit(meta.getOrElse("PLATFORM_SPECIES", null))
        .cast("string")).as("species"))
    (meta, out)
  }

  /** The reference's fuzzy header-name -> attribute regexes, in its
    * if-else-chain priority order; each header column takes the FIRST
    * matching pattern, a later duplicate header overrides the slot
    * (MetaDataProcessor.groovy:150-192). Full case-insensitive match. */
  val MetadataAttrPatterns: Seq[(String, String)] = Seq(
    "study_id" -> """Accession \(Internal study_id\)""",
    "title" -> "Title",
    "description" -> "Description",
    "study_design" -> "Study design",
    "completion_date" -> "Completion date",
    "pi" -> "PI",
    "institution" -> "Institution",
    "biomarker_type" -> "Biomarker Type",
    "access_type" -> "Access Type",
    "study_owner" -> "Study Owner",
    "study_phase" -> "Study Phase",
    "blinding_procedure" -> "Blinding Procedure",
    "study_type" -> "Study Type",
    "duration_of_study" -> "Duration of Study",
    "number_of_patients" -> "Number of Patients",
    "number_of_sites" -> "Number of Sites",
    "route_of_administration" -> "Route of Administration",
    "dosing_regimen" -> "Dosing Regimen",
    "group_assignment" -> "Group Assignment",
    "type_of_control" -> "Type of Control",
    "primary_endpoints" -> "Primary Endpoints",
    "secondary_endpoints" -> "Secondary Endpoints",
    "inclusion_criteria" -> "Inclusion Criteria",
    "exclusion_criteria" -> "Exclusion Criteria",
    "subjects" -> "Subjects",
    "gender_restriction" -> "Gender Restriction",
    "min_age" -> "Min.* Age",
    "max_age" -> "Max.* Age",
    "secondary_ids" -> "Secondary IDs",
    "development_partner" -> "Development Partner",
    "geo_platform" -> "GEO Platform",
    "main_findings" -> "Main Findings",
    "area" -> "Area",
    "drug_name" -> "Drug name",
    "condition" -> "Condition",
    "species" -> "(Species|Organism)")

  /** trim + strip ONE pair of surrounding quotes, DOTALL for multi-line
    * values (MetaDataProcessor.groovy:288-295). */
  private def fixMetaColumn(s: String): String = {
    if (s == null) return ""
    val t = s.trim
    "(?s)^\"(.+)\"$".r.replaceFirstIn(t, "$1")
  }

  /** S9: study metadata file — the ~36-attribute fuzzy header map plus
    * multi-line value continuation (a quoted cell may span lines; the
    * continuation joins with \n into the previous row's last cell until a
    * line whose first cell closes the quote —
    * MetaDataProcessor.groovy:195-224). One row per study; species
    * defaults to 'Homo Sapiens'. Parsed driver-side like the reference —
    * metadata files are one-row-per-study small. */
  def readStudyMetadata(spark: SparkSession, path: String): Seq[Map[String, String]] = {
    import spark.implicits._
    parseStudyMetadata(spark.read.textFile(path).collect().toSeq)
  }

  def parseStudyMetadata(lines: Seq[String]): Seq[Map[String, String]] = {
    if (lines.isEmpty) return Seq.empty
    val header = lines.head.split("\t", -1).map(fixMetaColumn)
    val mapping = scala.collection.mutable.LinkedHashMap[String, Int]()
    header.zipWithIndex.foreach { case (h, i) =>
      MetadataAttrPatterns.find { case (_, rx) => ("(?i)" + rx).r.matches(h) }
        .foreach { case (attr, _) => mapping(attr) = i }
    }
    require(mapping.contains("study_id"), "Study ID column is not defined")

    val out = Seq.newBuilder[Map[String, String]]
    var prev = scala.collection.mutable.Buffer.empty[String]
    lines.tail.zipWithIndex.foreach { case (line, idx) =>
      var cols = line.split("\t", -1).toBuffer
      if (prev.nonEmpty) {
        val firstCol = cols.headOption.getOrElse("")
        prev(prev.size - 1) = prev.last + "\n" + firstCol
        if (cols.size > 1) prev ++= cols.drop(1)
        cols = prev.clone()
        if (firstCol.matches("[^\"]*\"")) prev = scala.collection.mutable.Buffer.empty
        else { prev = cols.clone(); cols = scala.collection.mutable.Buffer.empty }
      }
      if (cols.nonEmpty) {
        if (cols.last.matches("\"[^\"]+") || cols.size < 2) {
          prev = cols.clone() // beginning of a multi-line value
        } else if (cols.head.nonEmpty) {
          val row = mapping.collect {
            case (attr, i) if i < cols.size && fixMetaColumn(cols(i)).nonEmpty =>
              attr -> fixMetaColumn(cols(i))
          }.toMap
          require(row.contains("study_id") && row.contains("title"),
            s"Study ID or Title are not defined at line ${idx + 2}")
          out += (row + ("species" -> row.getOrElse("species", "Homo Sapiens")))
        }
      }
    }
    out.result()
  }

  /** S5: GWAS-PLINK binary fileset — `.bed/.bim/.fam` via the binaryFile
    * source; `.fam` validated (6 whitespace columns, IID != 0, sex in
    * {0,1,2} — GWASPlinkDataProcessor.groovy:24-48). The reference stores
    * the files LZO-compressed in a LOB table; we keep raw bytes + length
    * (compression is a storage codec concern in the lakehouse). */
  def readPlink(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{bed,bim,fam}")
      .load(dir)
      .select(col("path"), col("length"), col("content"))
    import spark.implicits._
    val famPath = blobs.filter(col("path").endsWith(".fam"))
      .select("path").as[String].collect().headOption
    val fam = famPath.map { p =>
      spark.read.option("sep", " ").option("header", "false")
        .csv(p.replaceFirst("^file:", ""))
        .toDF("fid", "iid", "father", "mother", "sex", "phenotype")
    }.getOrElse(spark.emptyDataFrame)
    (blobs, fam)
  }

  /** S5 LOB store: the reference compresses `.bed/.bim/.fam` into a LOB
    * table (GWASPlinkDataProcessor.groovy:94-100,130-142, LZO codec). The
    * container has no LZO implementation, so the codec here is Deflate
    * (java.util.zip) — same shape (study_id, file_name, raw_length,
    * compressed bytes), documented codec swap. [[inflate]] is the
    * round-trip check. */
  def plinkLobTable(blobs: DataFrame, studyId: String): DataFrame = {
    import org.apache.spark.sql.functions.udf
    val deflateUdf = udf { (b: Array[Byte]) => deflate(b) }
    blobs.select(
      lit(studyId).as("study_id"),
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      col("length").as("raw_length"),
      deflateUdf(col("content")).as("content_compressed"))
  }

  def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def inflate(b: Array[Byte]): Array[Byte] = {
    val i = new java.util.zip.Inflater()
    i.setInput(b)
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 2))
    val buf = new Array[Byte](8192)
    while (!i.finished()) out.write(buf, 0, i.inflate(buf))
    i.end()
    out.toByteArray
  }

  /** Validate a `.fam` frame; returns violation messages. */
  def validateFam(fam: DataFrame): Seq[String] = {
    if (fam.columns.isEmpty) return Seq("no .fam file")
    val badIid = fam.filter(col("iid") === "0").count()
    val badSex = fam.filter(!col("sex").isin("0", "1", "2")).count()
    Seq(
      if (badIid > 0) Some(s"$badIid rows with IID=0") else None,
      if (badSex > 0) Some(s"$badSex rows with sex not in {0,1,2}") else None).flatten
  }
}

/** P3: aCGH 7-metrics-per-sample column-group melt
  * (ACGHDataProcessor.groovy:134-162): header
  * `region_id, S1.chip, S1.segmented, S1.flag, S1.probloss, S1.probnorm,
  * S1.probgain, S1.probamp, S2.chip, ...` -> one row per (region, sample)
  * carrying the 7 metrics. Generated stack of per-sample structs —
  * codegen'd, shuffle-free. */
object AcghMelt {
  import org.apache.spark.sql.{DataFrame}
  import org.apache.spark.sql.functions._

  val Metrics: Seq[String] =
    Seq("chip", "segmented", "flag", "probloss", "probnorm", "probgain", "probamp")

  def samplesOf(columns: Seq[String]): Seq[String] =
    columns.filter(_.endsWith(".chip")).map(_.stripSuffix(".chip"))

  def melt(df: DataFrame, idCol: String = "region_id"): DataFrame = {
    require(df.columns.headOption.contains(idCol), s"first column must be $idCol")
    val samples = samplesOf(df.columns.toSeq)
    val groups = samples.map { s =>
      struct(lit(s).as("sample_id") +:
        Metrics.map(m => col(s"`$s.$m`").cast("string").as(m)): _*)
    }
    df.select(col(idCol), explode(array(groups: _*)).as("g"))
      .select(col(idCol) +: ("sample_id" +: Metrics).map(f => col(s"g.$f")): _*)
  }
}

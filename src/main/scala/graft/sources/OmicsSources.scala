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
    val stackArgs = sampleCols
      .map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    matrix
      .select(col(idCol).as("probeset_id"),
        expr(s"stack(${sampleCols.length}, $stackArgs) as (sample_id, raw_value)"))
      .filter(length(coalesce(col("raw_value"), lit(""))) > 0)
      .withColumn("intensity_value", col("raw_value").cast("double"))
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
  def readPlatform(spark: SparkSession, path: String): (Map[String, String], DataFrame) = {
    val meta = TsvReader.metaHeader(spark, path)
    val df = TsvReader.read(spark, path)
    def find(rxs: String*): Option[String] =
      df.columns.find(c => rxs.exists(rx => c.toUpperCase.matches(rx)))
    val probeset = find("^ID(_REF)?$", "^PROBE(SET)?(_ID)?$").getOrElse(df.columns.head)
    val symbol = find("^GENE[ _]?SYMBOL$", "^SYMBOL$")
    val geneId = find("^ENTREZ[ _]?GENE[ _]?ID$", "^GENE[ _]?ID$")
    val species = find("^SPECIES.*", "^ORGANISM$")
    val out = df.select(
      col(probeset).as("probeset_id"),
      symbol.map(col).getOrElse(lit(null).cast("string")).as("gene_symbol"),
      geneId.map(c => col(c).cast("long")).getOrElse(lit(null).cast("long")).as("gene_id"),
      species.map(col).getOrElse(lit(meta.getOrElse("PLATFORM_SPECIES", null))
        .cast("string")).as("species"))
    (meta, out)
  }

  /** S9: study metadata file — header-name -> attribute fuzzy mapping with
    * multi-line value continuation (MetaDataProcessor.groovy:35-220).
    * Returns attribute -> value. */
  def readStudyMetadata(spark: SparkSession, path: String): Map[String, String] = {
    val df = TsvReader.read(spark, path)
    val cols = df.columns.map(_.toUpperCase.replaceAll("[^A-Z0-9]+", "_"))
    df.collect().headOption.map { row =>
      cols.zipWithIndex.collect {
        case (name, i) if !row.isNullAt(i) => name -> row.getString(i)
      }.toMap
    }.getOrElse(Map.empty)
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

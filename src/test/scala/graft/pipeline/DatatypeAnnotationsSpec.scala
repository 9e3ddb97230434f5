package graft.pipeline

import graft.SparkSpec
import graft.sources.TsvReader
import org.apache.spark.sql.functions._

/** Replays the reference's per-datatype platform fixtures through the five
  * sibling annotation-registry loads (DatatypeAnnotations). */
class DatatypeAnnotationsSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = "/root/reference/fixtures/Test Studies"

  test("metabolomics platform replays MET998: pathways split, marker join") {
    val raw = TsvReader.read(spark,
      s"$fixtures/Test Metabolomics Study/MetabolomicsDataToUpload/MET998.txt")
    val staged = raw.select(
      lit("MET998").as("gpl_id"),
      col("BIOCHEMICAL").as("biochemical_name"),
      when(length(coalesce(col("HMDB_ID"), lit(""))) > 0, col("HMDB_ID")).as("hmdb_id"),
      col("SUPER_PATHWAY").as("super_pathway"),
      col("SUB_PATHWAY").as("sub_pathway"))
    val markers = Seq(("mevalonic acid", "BM1"))
      .toDF("bio_marker_name", "primary_external_id")
    val t = DatatypeAnnotations.metabolomics(spark, staged, markers)

    assert(t.annotation.count() == 6)
    val mev = t.annotation.filter(col("biochemical_name") === "mevalonic acid").collect()(0)
    assert(mev.getAs[String]("biomarker_id") == "BM1")
    assert(mev.getAs[String]("hmdb_id") == "HMDB0TEST")
    // quoted biochemical name unwraps
    assert(t.annotation.filter(
      col("biochemical_name") === "3,3-dimethyl allyl pyrophosphoric acid").count() == 1)
    // 'Nucleotide sugars; pentose metabolism' splits into two sub-pathways
    val subs = t.subPathways.select("sub_pathway_name").collect().map(_.getString(0))
    assert(subs.contains("Nucleotide sugars"))
    assert(subs.contains("pentose metabolism"))
    // xylitol maps to both split sub-pathways
    val xid = t.annotation.filter(col("biochemical_name") === "xylitol")
      .collect()(0).getAs[Long]("id")
    assert(t.subPathwayMetab.filter(col("metabolite_id") === xid).count() == 2)
    // super-pathway ids are dense over distinct names
    assert(t.superPathways.count() ==
      staged.select("super_pathway").distinct().count())
  }

  test("RBM platform replays RBM100: antigen upsert, numeric gene ids") {
    val raw = TsvReader.read(spark,
      s"$fixtures/Test RBM Study/RBMDataToUpload/RBM100.txt")
    val staged = raw.select(
      col("gpl_id"), col("antigen_name"),
      when(length(coalesce(col("uniprot"), lit(""))) > 0, col("uniprot")).as("uniprotid"),
      when(length(coalesce(col("gene_symbol"), lit(""))) > 0, col("gene_symbol"))
        .as("gene_symbol"),
      when(length(coalesce(col("gene_id"), lit(""))) > 0, col("gene_id")).as("gene_id"))
    val emptyAntigens = Seq.empty[(Long, String, String)]
      .toDF("antigen_id", "antigen_name", "platform")
    val markers = Seq(("SYM1", "1", "rbm"))
      .toDF("bio_marker_name", "primary_external_id", "bio_marker_type")
    val t = DatatypeAnnotations.rbm(spark, staged, emptyAntigens, markers)

    val nAntigens = staged.select("antigen_name").distinct().count()
    assert(t.antigens.count() == nAntigens)
    assert(t.antigens.agg(max("antigen_id")).collect()(0).getLong(0) == nAntigens)
    val ck = t.annotation.filter(col("antigen_name") === "6Ckine").collect()(0)
    assert(ck.getAs[String]("uniprot_id") == "O00585")
    assert(ck.getAs[Long]("gene_id") == 1L)
    // antigens sharing gene_id 3 keep distinct antigen ids
    val shared = t.annotation
      .filter(col("antigen_name").isin("Agouti-Related Protein", "Aldose Reductase"))
      .collect()
    assert(shared.length == 2)
    assert(shared.forall(_.getAs[Long]("gene_id") == 3L))
    assert(shared.map(_.getAs[Long]("id")).distinct.length == 2)
  }

  test("miRNA qpcr platform replays GPL15467: registry upsert + lower()") {
    val raw = TsvReader.read(spark,
      s"$fixtures/Test MirnaQpcr Study/MIRNA_QPCRDataToUpload/GPL15467qpcrbased.txt")
    val staged = raw.select(
      col("ID_REF").as("id_ref"),
      when(length(coalesce(col("miRNA_ID"), lit(""))) > 0, col("miRNA_ID")).as("mirna_id"),
      when(length(coalesce(col("Organism"), lit(""))) > 0, col("Organism")).as("organism"),
      lit("GPL15467qpcrbased").as("gpl_id"))
    val existing = Seq((7L, "1", "Old organism", "GPL15467qpcrbased"))
      .toDF("probeset_id", "probeset", "organism", "platform")
    val t = DatatypeAnnotations.mirna(spark, staged, existing)

    val nProbes = staged.select("id_ref").distinct().count()
    assert(t.probesets.count() == nProbes)
    // the pre-existing probeset kept its id but refreshed its organism
    val p1 = t.probesets.filter(col("probeset") === "1").collect()(0)
    assert(p1.getAs[Long]("probeset_id") == 7L)
    assert(p1.getAs[String]("organism") == "Mus musculus")
    // fresh ids start above the existing max
    assert(t.probesets.filter(col("probeset") =!= "1")
      .agg(min("probeset_id")).collect()(0).getLong(0) == 8L)
    // annotation carries the lowercased mirna id
    val a1 = t.annotation.filter(col("id_ref") === "1").collect()(0)
    assert(a1.getAs[String]("mirna_id") == "mmu-let-7b")
    assert(a1.getAs[Long]("probeset_id") == 7L)
    assert(t.annotation.count() == nProbes)
  }

  test("registry reloads are idempotent (delete-by-platform + reinsert)") {
    // running the same staged platform twice must converge: the second
    // load replaces the first's rows and reassigns the same ids
    val staged = Seq(
      ("GPLI", "r1", "1", 1, 10, 1, "c", "S1", java.lang.Long.valueOf(5L), "Homo Sapiens"),
      ("GPLI", "r2", "2", 11, 20, 2, "c", null, null.asInstanceOf[java.lang.Long], "Homo Sapiens"))
      .toDF("gpl_id", "region_name", "chromosome", "start_bp", "end_bp",
        "num_probes", "cytoband", "gene_symbol", "gene_id", "organism")
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("region_id", "gpl_id", "region_name", "gene_symbol", "gene_id")
    val emptyGpl = Seq.empty[(String, String, String, String, String)]
      .toDF("platform", "title", "organism", "marker_type", "release_nbr")
    val emptyBm = Seq.empty[(String, String, String, String)]
      .toDF("bio_marker_name", "organism", "primary_external_id", "bio_marker_type")
    val once = ChromRegion.load(spark, staged, empty, emptyGpl, emptyBm)
    val twice = ChromRegion.load(spark, staged,
      once.regions.select("region_id", "gpl_id", "region_name",
        "gene_symbol", "gene_id"),
      once.gplInfo, emptyBm)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("region_id", "gpl_id", "region_name").collect()
        .map(_.toSeq).toSet
    assert(snap(once.regions) == snap(twice.regions))
    assert(twice.gplInfo.count() == 1)

    // same for the RBM antigen upsert: re-staging assigns no new ids
    val rbmStaged = Seq(("GPLB2", "A1", "U1", "G1", "7"))
      .toDF("gpl_id", "antigen_name", "uniprotid", "gene_symbol", "gene_id")
    val noAntigens = Seq.empty[(Long, String, String)]
      .toDF("antigen_id", "antigen_name", "platform")
    val noMarkers = Seq.empty[(String, String, String)]
      .toDF("bio_marker_name", "primary_external_id", "bio_marker_type")
    val r1 = DatatypeAnnotations.rbm(spark, rbmStaged, noAntigens, noMarkers)
    val r2 = DatatypeAnnotations.rbm(spark, rbmStaged, r1.antigens, noMarkers)
    assert(r1.antigens.collect().map(_.toSeq).toSet ==
      r2.antigens.collect().map(_.toSeq).toSet)
  }

  test("proteomics: trim, uniprot_name mirror, organism default, replace") {
    val staged = Seq(
      ("GPLP", "  PEP1  ", "U1", null),
      ("GPLP", "PEP2", null, "Mus musculus"),
      ("GPLP", "PEP2", null, "Mus musculus")) // dup collapses
      .toDF("gpl_id", "peptide", "uniprot_id", "organism")
    val existing = Seq(
      ("GPLP", "STALE", null, null, "Homo sapiens"),
      ("GPLQ", "KEPT", null, null, "Homo sapiens"))
      .toDF("gpl_id", "peptide", "uniprot_id", "uniprot_name", "organism")
    val out = DatatypeAnnotations.proteomics(staged, existing)
    assert(out.count() == 3)
    assert(out.filter(col("peptide") === "STALE").count() == 0)
    val p1 = out.filter(col("peptide") === "PEP1").collect()(0)
    assert(p1.getAs[String]("uniprot_name") == "U1")
    assert(p1.getAs[String]("organism") == "Homo sapiens")
  }

  test("rna: transcript NOT-IN insert, symbol backfill hits old null ids too") {
    val staged = Seq(
      ("T1", "GPLR", "BRCA1", "Homo sapiens"), // transcript exists -> skipped
      ("T9", "GPLR", "BRCA1", "Homo sapiens"),
      ("T10", "GPLR", null, "Homo sapiens"))
      .toDF("transcript_id", "gpl_id", "gene_symbol", "organism")
    val existing = Seq(
      ("T1", "GPLOLD", "TP53", null.asInstanceOf[java.lang.Long], "Homo sapiens"))
      .toDF("transcript_id", "gpl_id", "gene_symbol", "gene_id", "organism")
    val markers = Seq(("BRCA1", "672"), ("BRCA1", "900"), ("TP53", "7157"))
      .toDF("bio_marker_name", "primary_external_id")
    val out = DatatypeAnnotations.rna(staged, existing, markers)
    assert(out.count() == 3) // T1 old + T9 + T10
    assert(out.filter(col("transcript_id") === "T1" && col("gpl_id") === "GPLR")
      .count() == 0)
    val byT = out.collect().map(r => r.getAs[String]("transcript_id") ->
      r.getAs[java.lang.Long]("gene_id")).toMap
    assert(byT("T1") == 7157L) // pre-existing null id backfilled too
    assert(byT("T9") == 672L)  // min of {672, 900}
    assert(byT("T10") == null)
  }
}

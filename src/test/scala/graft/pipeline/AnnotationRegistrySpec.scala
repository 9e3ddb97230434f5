package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnotationRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val staged = Seq(
    // existing probe, organism refresh Homo->Mus
    ("GPL1", "PS1", "BRCA1", "672", "Mus musculus"),
    // new probe, null organism -> default
    ("GPL1", "PS2", "TP53", null, null),
    // new probe, null symbol -> backfilled from gene registry by id
    ("GPL1", "PS3", null, "7157", "Homo sapiens"),
    // new probe, both null -> stays null
    ("GPL1", "PS4", null, null, "Homo sapiens")
  ).toDF("gpl_id", "probe_id", "gene_symbol", "gene_id", "organism")

  private val existing = Seq(
    (10L, "PS1", "GPL1", "Homo sapiens"),
    (11L, "OTHER", "GPL1", "Homo sapiens") // untouched registry row
  ).toDF("probeset_id", "probeset", "platform", "organism")

  private val markers = Seq(
    ("TP53", "HOMO SAPIENS", "7157", "GENE"),
    ("TP53", "Homo sapiens", "9999", "PROTEIN"), // wrong type: ignored
    ("BRCA1", "Mus musculus", "672", "gene")
  ).toDF("bio_marker_name", "organism", "primary_external_id", "bio_marker_type")

  test("registry upsert: organism refresh, deterministic new ids, untouched rows") {
    val rows = AnnotationRegistry.load(spark, staged, existing, markers).probesets
      .orderBy("probeset_id").collect()
    // refreshed existing row keeps id 10 with the new organism
    assert(rows.exists(r => r.getLong(0) == 10L && r.getString(1) == "PS1"
      && r.getString(3) == "Mus musculus"))
    // untouched row survives verbatim
    assert(rows.exists(r => r.getLong(0) == 11L && r.getString(1) == "OTHER"))
    // new probesets get ids from max(existing)+1, ordered by (platform, probeset, organism)
    val fresh = rows.filter(_.getLong(0) > 11L).map(r => (r.getLong(0), r.getString(1)))
    assert(fresh.toSeq == Seq((12L, "PS2"), (13L, "PS3"), (14L, "PS4")))
  }

  test("probe staged under two organisms: one refresh, other gets a fresh id") {
    // the reference UPDATEs the existing row once and inserts the second
    // organism as a NEW probeset_id via the NOT-EXISTS path — the refresh
    // must not fan the existing probeset_id out across organisms
    val twoOrg = Seq(
      ("GPL1", "PS1", "BRCA1", "672", "Homo sapiens"),
      ("GPL1", "PS1", "BRCA1", "672", "Mus musculus")
    ).toDF("gpl_id", "probe_id", "gene_symbol", "gene_id", "organism")
    val reg = AnnotationRegistry.load(spark, twoOrg, existing, markers).probesets
    val ps1 = reg.filter($"probeset" === "PS1").orderBy("probeset_id").collect()
    assert(ps1.length == 2)
    // min(organism) keeps 'Homo sapiens' on the existing id 10
    assert(ps1(0).getLong(0) == 10L && ps1(0).getString(3) == "Homo sapiens")
    // 'Mus musculus' arrives as a fresh id, not a duplicate of 10
    assert(ps1(1).getLong(0) == 12L && ps1(1).getString(3) == "Mus musculus")
    // exactly one registry row per (platform, probeset, organism)
    assert(reg.groupBy("platform", "probeset", "organism").count()
      .filter($"count" > 1).count() == 0)
  }

  test("annotation build: organism default, gene_id backfill, type filter") {
    val ann = AnnotationRegistry.load(spark, staged, existing, markers).mrnaAnnotation
      .collect().map(r => r.getString(1) ->
        (Option(r.get(2)), Option(r.get(3)), r.getString(5))).toMap
    // TP53 gene_id backfilled from the GENE marker (not the PROTEIN one)
    assert(ann("PS2") == (Some("TP53"), Some(7157L), "Homo sapiens"))
    // symbol backfilled by gene id (intended semantics; the reference's
    // EXISTS guard makes its own statement a no-op -- see Scaladoc)
    assert(ann("PS3") == (Some("TP53"), Some(7157L), "Homo sapiens"))
    // both-null row survives with defaults only
    assert(ann("PS4") == (None, None, "Homo sapiens"))
    // staged organism kept; gene_id cast to numeric
    assert(ann("PS1") == (Some("BRCA1"), Some(672L), "Mus musculus"))
  }
}

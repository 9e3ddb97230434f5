package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StudyOpsSpec extends SparkSpec {
  import spark.implicits._

  /** A two-study warehouse: GS1 under \Public Studies\, GS2 under \Other\. */
  private def star: StudyOps.Star = {
    val i2b2 = Seq(
      ("\\Public Studies\\", 1, "Public Studies", null),
      ("\\Public Studies\\GS1\\", 2, "GS1", "GS1"),
      ("\\Public Studies\\GS1\\Vitals\\", 3, "Vitals", "GS1"),
      ("\\Other\\", 1, "Other", null),
      ("\\Other\\GS2\\", 2, "GS2", "GS2"))
      .toDF("c_fullname", "c_hlevel", "c_name", "sourcesystem_cd")
      .withColumn("c_dimcode", col("c_fullname"))
      .withColumn("c_tooltip", col("c_fullname"))
    val cd = Seq(
      ("\\Public Studies\\GS1\\", "C1", "GS1"),
      ("\\Public Studies\\GS1\\Vitals\\", "C2", "GS1"),
      ("\\Other\\GS2\\", "C3", "GS2"))
      .toDF("concept_path", "concept_cd", "sourcesystem_cd")
    StudyOps.Star(
      tableAccess = i2b2.select(col("c_fullname")),
      i2b2 = i2b2,
      i2b2Secure = i2b2.select(col("c_fullname"))
        .withColumn("secure_obj_token",
          when(col("c_fullname").startsWith("\\Other\\GS2"), "EXP:GS2")
            .when(col("c_fullname").startsWith("\\Public Studies\\GS1"), "EXP:GS1")
            .otherwise("EXP:PUBLIC")),
      i2b2Tags = Seq(("\\Public Studies\\GS1\\", "t1")).toDF("path", "tag"),
      conceptDimension = cd,
      conceptCounts = cd.select(col("concept_path"))
        .withColumn("parent_concept_path", lit("\\Public Studies\\"))
        .withColumn("patient_count", lit(1L)),
      observationFact = Seq(
        (101L, "C1", "GS1"), (101L, "SECURITY", "GS1"),
        (102L, "C2", "GS1"), (201L, "C3", "GS2"), (201L, "SECURITY", "GS2"))
        .toDF("patient_num", "concept_cd", "sourcesystem_cd"),
      patientDimension = Seq(
        (101L, "GS1:S1"), (102L, "GS1:S2"), (201L, "GS2:S1"))
        .toDF("patient_num", "sourcesystem_cd"),
      patientTrial = Seq((101L, "GS1"), (102L, "GS1"), (201L, "GS2"))
        .toDF("patient_num", "trial"),
      sampleMapping = Seq(("GS1", 11L, "C1", "STD"), ("GS2", 21L, "C3", "STD"))
        .toDF("trial_name", "assay_id", "concept_code", "source_cd"),
      omicsData = Map("de_subject_microarray_data" ->
        Seq(("GS1", 11L, 1.0), ("GS2", 21L, 2.0))
          .toDF("trial_name", "assay_id", "v")),
      variantDatasets = Seq(("DS1"), ("DS2")).toDF("dataset_id"),
      variantTables = Map(
        "de_variant_subject_summary" ->
          Seq(("DS1", 11L), ("DS2", 21L)).toDF("dataset_id", "assay_id"),
        "de_variant_population_data" ->
          Seq(("DS1", 1), ("DS2", 2)).toDF("dataset_id", "x")),
      bioExperiment = Seq(("GS1", "Study 1"), ("GS2", "Study 2"))
        .toDF("accession", "title"),
      bioDataUid = Seq(("EXP:GS1"), ("EXP:GS2")).toDF("unique_id"),
      searchSecureObject = Seq(("EXP:GS1"), ("EXP:GS2")).toDF("bio_data_unique_id"))
  }

  test("move validation matrix rejects the reference's error cases") {
    val exists = Set("\\Public Studies\\GS1\\", "\\Public Studies\\GS1\\Vitals\\",
      "\\Other\\GS2\\", "\\Public Studies\\", "\\Other\\")
    def v(o: String, n: String, osp: Option[String] = Some("\\Public Studies\\GS1\\")) =
      StudyOps.validateMove(o, n, exists.contains, osp)
    assert(v("", "\\X\\Y\\").exists(_.contains("empty")))
    assert(v("\\Public Studies\\GS1\\", "\\Public Studies\\GS1\\")
      .exists(_.contains("different old and new")))
    assert(v("\\Missing\\Path\\", "\\X\\Y\\", None)
      .exists(_.contains("exists study path")))
    assert(v("\\Public Studies\\GS1\\", "\\NewRoot\\")
      .exists(_.contains("can not be root node")))
    // sub-node moved outside its study root
    assert(v("\\Public Studies\\GS1\\Vitals\\", "\\Other\\Vitals\\")
      .exists(_.contains("inside of study root")))
    // target occupied by another study
    assert(v("\\Public Studies\\GS1\\", "\\Other\\GS2\\")
      .exists(_.contains("already exists")))
    // legal whole-study move
    assert(v("\\Public Studies\\GS1\\", "\\Other\\GS1 Renamed\\").isEmpty)
    // legal sub-node move within the study
    assert(v("\\Public Studies\\GS1\\Vitals\\",
      "\\Public Studies\\GS1\\Measurements\\").isEmpty)
  }

  test("whole-study move: prefix rewrite, levels, c_name, root management") {
    val r = StudyOps.moveStudyByPath(spark, star,
      "\\Public Studies\\GS1\\", "\\Archive\\GS1X\\")
    assert(r.error.isEmpty)
    val paths = r.star.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(paths.contains("\\Archive\\GS1X\\"))
    assert(paths.contains("\\Archive\\GS1X\\Vitals\\"))
    assert(paths.contains("\\Archive\\")) // new root created
    assert(!paths.contains("\\Public Studies\\")) // old root GC'd (no other child)
    assert(paths.contains("\\Other\\GS2\\")) // other study untouched
    val moved = r.star.i2b2.filter(col("c_fullname") === "\\Archive\\GS1X\\").collect()(0)
    assert(moved.getAs[String]("c_name") == "GS1X")
    val lvl = r.star.i2b2.filter(col("c_fullname") === "\\Archive\\GS1X\\Vitals\\")
      .select("c_hlevel").collect()(0).getInt(0)
    assert(lvl == star.i2b2.filter(col("c_fullname") === "\\Public Studies\\GS1\\Vitals\\")
      .select("c_hlevel").collect()(0).getInt(0)) // same depth here
    // concept_dimension moved too
    val cps = r.star.conceptDimension.select("concept_path")
      .collect().map(_.getString(0)).toSet
    assert(cps.contains("\\Archive\\GS1X\\Vitals\\") && !cps.exists(_.startsWith("\\Public Studies\\GS1")))
  }

  test("move to a deeper path creates intermediate levels; moving back removes them") {
    // testMoveStudyWithCreatingNewLevel / WithDeletingNewLevel
    // (MoveStudyOperationTest.groovy:53-76)
    val r = StudyOps.moveStudyByPath(spark, star,
      "\\Public Studies\\GS1\\", "\\A\\New level\\GS1\\")
    assert(r.error.isEmpty)
    val byPath = r.star.i2b2.select("c_fullname", "c_hlevel").collect()
      .map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(byPath.contains("\\A\\") && byPath.contains("\\A\\New level\\"))
    assert(byPath("\\A\\New level\\") == 2)
    assert(byPath("\\A\\New level\\GS1\\") == 3)
    assert(byPath("\\A\\New level\\GS1\\Vitals\\") == 4) // renumbered +1

    val back = StudyOps.moveStudyByPath(spark, r.star,
      "\\A\\New level\\GS1\\", "\\Z\\GS1\\")
    assert(back.error.isEmpty)
    val paths = back.star.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(!paths.exists(_.startsWith("\\A\\"))) // empty levels removed
    assert(paths.contains("\\Z\\GS1\\Vitals\\"))
  }

  test("paths without trailing slash normalize (testMoveStudyWithoutTrailingSlash)") {
    val r = StudyOps.moveStudyByPath(spark, star,
      "\\Public Studies\\GS1", "\\Archive\\GS1")
    assert(r.error.isEmpty)
    val paths = r.star.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(paths.contains("\\Archive\\GS1\\Vitals\\"))
  }

  test("keep-security transplant deletes the occupying study and keeps the old accession") {
    // legal target-exists move requires saveSecurity; GS2 occupies the target
    val r = StudyOps.moveStudyByPath(spark, star,
      "\\Public Studies\\GS1\\", "\\Other\\GS2\\", saveSecurity = true)
    // the occupying study's data is gone
    assert(r.error.isEmpty)
    assert(r.star.patientTrial.filter(col("trial") === "GS2").count() == 0)
    assert(r.star.sampleMapping.filter(col("trial_name") === "GS2").count() == 0)
    // GS1's accession survives, transplanted over GS2's slot
    val acc = r.star.bioExperiment.select("accession").collect().map(_.getString(0)).toSet
    assert(acc == Set("GS1"))
    val uids = r.star.bioDataUid.select("unique_id").collect().map(_.getString(0)).toSet
    assert(uids == Set("EXP:GS1"))
    // and the moved paths landed at the target
    val paths = r.star.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(paths.contains("\\Other\\GS2\\Vitals\\"))
  }

  /** The real GSE0 clinical fixture loaded into a Star — the warehouse the
    * reference's move tests operate on. */
  private lazy val gse0: StudyOps.Star = {
    import graft.pipeline.ClinicalPipeline
    import graft.sources.{ClinicalMapping, TsvReader}
    val dir = "/root/reference/fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark, s"$dir/Test Study_GSE0_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0", "\\Test Studies\\Test Study",
      mapping, files)

    val emptyStr = Seq.empty[(String, String)].toDF("a", "b")
    StudyOps.Star(
      tableAccess = t.i2b2.select(col("c_fullname")),
      i2b2 = t.i2b2.select(col("c_fullname"), col("c_hlevel"), col("c_name"))
        .withColumn("c_dimcode", col("c_fullname"))
        .withColumn("c_tooltip", col("c_fullname"))
        // only the study subtree belongs to the trial; \Test Studies\ is a
        // shared root with no sourcesystem
        .withColumn("sourcesystem_cd",
          when(col("c_fullname").startsWith("\\Test Studies\\Test Study\\"),
            "GSE0")),
      i2b2Secure = t.i2b2.select(col("c_fullname"))
        .withColumn("secure_obj_token", lit("EXP:GSE0")),
      i2b2Tags = emptyStr.select(col("a").as("path"), col("b").as("tag")),
      conceptDimension = t.conceptDimension
        .select(col("leaf_node").as("concept_path"), col("concept_cd"))
        .withColumn("sourcesystem_cd", lit("GSE0")),
      conceptCounts = t.conceptCounts
        .select(col("c_fullname").as("concept_path"), col("patient_count"))
        .withColumn("parent_concept_path", lit(null).cast("string")),
      observationFact = t.observationFact
        .select(col("patient_num"), col("concept_cd"), col("sourcesystem_cd")),
      patientDimension = t.patientDimension
        .select(col("patient_num"), col("usubjid").as("sourcesystem_cd")),
      patientTrial = t.patientDimension
        .select(col("patient_num")).withColumn("trial", lit("GSE0")),
      sampleMapping = Seq.empty[(String, Long, String, String)]
        .toDF("trial_name", "assay_id", "concept_code", "source_cd"),
      omicsData = Map.empty,
      variantDatasets = emptyStr.select(col("a").as("dataset_id")),
      variantTables = Map.empty,
      bioExperiment = Seq(("GSE0", "Test Study")).toDF("accession", "title"),
      bioDataUid = Seq("EXP:GSE0").toDF("unique_id"),
      searchSecureObject = Seq("EXP:GSE0").toDF("bio_data_unique_id"))
  }

  test("sub-node move replays testMoveSubfolder: counts recomputed, not renamed") {
    // MoveStudyOperationTest.groovy:253-270 over the real GSE0 fixture:
    // move \Subjects\Demographics\Language\ under 'Demographics new' and
    // expect the reference's exact count matrix — the old parent keeps its
    // OTHER children's rollups, the new intermediate gets the moved ones
    val base = "\\Test Studies\\Test Study\\Subjects\\"
    val r = StudyOps.moveStudyByPath(spark, gse0,
      s"${base}Demographics\\Language\\", s"${base}Demographics new\\Language\\")
    assert(r.error.isEmpty)

    val counts = r.star.conceptCounts.collect()
      .map(x => x.getAs[String]("concept_path") -> x.getAs[Long]("patient_count"))
      .toMap
    // the reference's matrix (testMoveSubfolder)
    assert(counts(s"${base}Demographics new\\") == 3)
    assert(counts(s"${base}Demographics new\\Language\\") == 3)
    assert(counts(s"${base}Demographics new\\Language\\English\\") == 2)
    assert(counts(s"${base}Demographics new\\Language\\Spain\\") == 1)
    assert(counts(s"${base}Demographics\\Sex (SEX)\\Female\\") == 5)
    assert(counts(s"${base}Demographics\\Sex (SEX)\\") == 7)
    assert(counts(s"${base}Demographics\\Assessment Date\\") == 9)
    // moved paths exist in the tree, old ones gone
    val paths = r.star.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(paths.contains(s"${base}Demographics new\\Language\\English\\"))
    assert(!paths.contains(s"${base}Demographics\\Language\\"))

    // testItDoesntMoveSubfolderOutsideOfStudy: reject crossing the root
    val bad = StudyOps.moveStudyByPath(spark, gse0,
      s"${base}Demographics\\Language\\",
      "\\Test Studies\\Other Study\\Subjects\\Demographics\\Language\\")
    assert(bad.error.exists(_.contains("inside of study root")))

    // testMoveSubfolder2: the target introduces a NEW top-level intermediate
    // ('Subjects new') that must be filled in and counted
    val top = "\\Test Studies\\Test Study\\"
    val r2 = StudyOps.moveStudyByPath(spark, gse0,
      s"${base}Demographics\\Language\\",
      s"${top}Subjects new\\Demographics\\Language\\")
    assert(r2.error.isEmpty)
    val c2 = r2.star.conceptCounts.collect()
      .map(x => x.getAs[String]("concept_path") -> x.getAs[Long]("patient_count"))
      .toMap
    assert(c2(s"${top}Subjects new\\Demographics\\") == 3)
    assert(c2(s"${top}Subjects new\\Demographics\\Language\\") == 3)
    assert(c2(s"${top}Subjects new\\Demographics\\Language\\English\\") == 2)
    assert(c2(s"${top}Subjects new\\Demographics\\Language\\Spain\\") == 1)
    assert(c2(s"${base}Demographics\\Sex (SEX)\\Female\\") == 5)
    assert(c2(s"${base}Demographics\\Sex (SEX)\\Male\\") == 2)

    // testMoveSubfolder3: BOTH intermediates new ('Subjects new\Demographics new')
    val r3 = StudyOps.moveStudyByPath(spark, gse0,
      s"${base}Demographics\\Language\\",
      s"${top}Subjects new\\Demographics new\\Language\\")
    assert(r3.error.isEmpty)
    val c3 = r3.star.conceptCounts.collect()
      .map(x => x.getAs[String]("concept_path") -> x.getAs[Long]("patient_count"))
      .toMap
    assert(c3(s"${top}Subjects new\\Demographics new\\") == 3)
    assert(c3(s"${top}Subjects new\\Demographics new\\Language\\") == 3)
    assert(c3(s"${top}Subjects new\\Demographics new\\Language\\English\\") == 2)
    assert(c3(s"${top}Subjects new\\Demographics new\\Language\\Spain\\") == 1)
  }

  test("deep leaf moved to a new shallow branch (testMoveSubfolder4)") {
    // MoveStudyOperationTest.groovy:271-280: pull ELREA746del out from four
    // levels down to a new 'test' branch; the old Biomarker rollup drops to
    // the reference's 6
    val top = "\\Test Studies\\Test Study\\"
    val r = StudyOps.moveStudyByPath(spark, gse0,
      s"${top}Biomarker Data\\Mutations\\TST001 (Entrez ID: 1956)\\AA mutation\\ELREA746del\\",
      s"${top}test\\ELREA746del\\")
    assert(r.error.isEmpty)
    val counts = r.star.conceptCounts.collect()
      .map(x => x.getAs[String]("concept_path") -> x.getAs[Long]("patient_count"))
      .toMap
    assert(counts(s"${top}Biomarker Data\\") == 6)
    assert(counts.contains(s"${top}test\\ELREA746del\\"))
  }

  test("whole-study move rewrites concept_counts parent links; no counts above the study root") {
    // testItCheckUpdateConceptCounts / WIthDoubleChangeTop /
    // WithAddHierarchyLevel (MoveStudyOperationTest.groovy:323-382): the
    // old subtree's count rows are GONE (not just renamed), the new rows
    // carry rewritten parent links, and intermediate levels above the study
    // root exist in i2b2 but get NO concept_counts row
    val old = "\\Test Studies\\Test Study\\"
    val target = "\\Test Studies Update\\C\\D\\"
    val r = StudyOps.moveStudyByPath(spark, gse0, old, target)
    assert(r.error.isEmpty)
    val parents = r.star.conceptCounts.collect()
      .map(x => x.getAs[String]("concept_path") ->
        x.getAs[String]("parent_concept_path")).toMap
    assert(parents(s"${target}Subjects\\Demographics\\") == s"${target}Subjects\\")
    assert(!parents.keys.exists(_.startsWith(old)))
    assert(!parents.contains("\\Test Studies Update\\C\\"))
    val ps = paths(r.star)
    assert(ps.contains("\\Test Studies Update\\"))
    assert(ps.contains("\\Test Studies Update\\C\\"))
    assert(ps.contains(s"${target}Subjects\\Demographics\\"))
  }

  /** A warehouse with studies at the given (path, trial) leaves plus all
    * their ancestor folder nodes, concept_counts parent links included —
    * the shape the top-node delete recursion walks. */
  private def treeStar(studies: Seq[(String, String)]): StudyOps.Star = {
    def ancestors(p: String): Seq[String] = {
      val parts = p.stripPrefix("\\").stripSuffix("\\").split("\\\\")
      (1 until parts.length).map(i => parts.take(i).mkString("\\", "\\", "\\"))
    }
    val folders = studies.flatMap(s => ancestors(s._1)).distinct
    val i2b2 = (folders.map(f => (f, f.count(_ == '\\') - 1, null: String)) ++
      studies.map(s => (s._1, s._1.count(_ == '\\') - 1, s._2)))
      .toDF("c_fullname", "c_hlevel", "sourcesystem_cd")
      .withColumn("c_name", lit("n"))
      .withColumn("c_dimcode", col("c_fullname"))
      .withColumn("c_tooltip", col("c_fullname"))
    def parent(p: String): String = {
      val a = ancestors(p)
      if (a.isEmpty) null else a.last
    }
    val counts = (folders ++ studies.map(_._1))
      .map(p => (p, parent(p), 1L))
      .toDF("concept_path", "parent_concept_path", "patient_count")
    val cd = studies.map(s => (s._1, "C" + s._2, s._2))
      .toDF("concept_path", "concept_cd", "sourcesystem_cd")
    val emptyStr = Seq.empty[(String, String)].toDF("a", "b")
    StudyOps.Star(
      tableAccess = i2b2.select(col("c_fullname")),
      i2b2 = i2b2,
      i2b2Secure = i2b2.select(col("c_fullname"))
        .withColumn("secure_obj_token", lit("EXP:PUBLIC")),
      i2b2Tags = emptyStr.select(col("a").as("path"), col("b").as("tag")),
      conceptDimension = cd,
      conceptCounts = counts,
      observationFact = studies.map(s => (1L, "C" + s._2, s._2))
        .toDF("patient_num", "concept_cd", "sourcesystem_cd"),
      patientDimension = studies.zipWithIndex
        .map { case (s, i) => (i.toLong, s"${s._2}:S$i") }
        .toDF("patient_num", "sourcesystem_cd"),
      patientTrial = studies.zipWithIndex.map { case (s, i) => (i.toLong, s._2) }
        .toDF("patient_num", "trial"),
      sampleMapping = Seq.empty[(String, Long, String, String)]
        .toDF("trial_name", "assay_id", "concept_code", "source_cd"),
      omicsData = Map.empty,
      variantDatasets = emptyStr.select(col("a").as("dataset_id")),
      variantTables = Map.empty,
      bioExperiment = studies.map(s => (s._2, "t")).toDF("accession", "title"),
      bioDataUid = studies.map(s => "EXP:" + s._2).toDF("unique_id"),
      searchSecureObject = studies.map(s => "EXP:" + s._2)
        .toDF("bio_data_unique_id"))
  }

  private def paths(s: StudyOps.Star): Set[String] =
    s.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet

  test("top node deleted when the removed study was its last child (testItDeleteTopNode)") {
    val s = treeStar(Seq(("\\Delete Operation Test\\S1\\", "S1")))
    val d = StudyOps.deleteStudy(spark, s,
      Some("\\Delete Operation Test\\S1\\"), Some("S1"))
    assert(paths(d).isEmpty) // study AND the now-empty top node are gone
  }

  test("top node survives while a sibling study remains, falls with the last (testItNotDeleteTopNode)") {
    val s = treeStar(Seq(
      ("\\Delete Operation Test\\S1\\", "S1"),
      ("\\Delete Operation Test\\S2\\", "S2")))
    val d1 = StudyOps.deleteStudy(spark, s,
      Some("\\Delete Operation Test\\S2\\"), Some("S2"))
    assert(paths(d1) ==
      Set("\\Delete Operation Test\\", "\\Delete Operation Test\\S1\\"))
    val d2 = StudyOps.deleteStudy(spark, d1,
      Some("\\Delete Operation Test\\S1\\"), Some("S1"))
    assert(paths(d2).isEmpty)
  }

  test("empty parents removed recursively all the way up (testItDeleteTopEmptyNode)") {
    val s = treeStar(Seq(
      ("\\Delete Operation Test\\Test Study\\S3\\", "S3"),
      ("\\Delete Operation Test\\Test Study\\S4\\", "S4")))
    val d1 = StudyOps.deleteStudy(spark, s,
      Some("\\Delete Operation Test\\Test Study\\S4\\"), Some("S4"))
    // the sub-top keeps S3, so both levels survive
    assert(paths(d1).contains("\\Delete Operation Test\\Test Study\\"))
    assert(paths(d1).contains("\\Delete Operation Test\\"))
    val d2 = StudyOps.deleteStudy(spark, d1,
      Some("\\Delete Operation Test\\Test Study\\S3\\"), Some("S3"))
    // last study out: the empty sub-top AND the empty root both fall
    assert(paths(d2).isEmpty)
  }

  test("sub-node delete leaves the study's other branches and the top alone (testItDeleteSubNode)") {
    val s = treeStar(Seq(
      ("\\Test Studies\\GS1\\SNP\\", "GS1"),
      ("\\Test Studies\\GS1\\Expression\\", "GS1")))
    val d = StudyOps.deleteStudy(spark, s,
      Some("\\Test Studies\\GS1\\SNP\\"), Some("GS1"))
    assert(paths(d).contains("\\Test Studies\\"))
    assert(paths(d).contains("\\Test Studies\\GS1\\Expression\\"))
    assert(!paths(d).contains("\\Test Studies\\GS1\\SNP\\"))
  }

  test("delete is exact-case on the path (testItDeleteDataSensitiveCase)") {
    val s = treeStar(Seq(
      ("\\Test Studies\\Abc\\", "T1"),
      ("\\Test Studies\\ABC\\", "T2")))
    val d = StudyOps.deleteStudy(spark, s, Some("\\Test Studies\\ABC\\"), Some("T2"))
    assert(paths(d).contains("\\Test Studies\\Abc\\"))
    assert(!paths(d).contains("\\Test Studies\\ABC\\"))
  }

  test("delete cascade removes the study from every table, resolves path from trial id") {
    val d = StudyOps.deleteStudy(spark, star, pathIn = None, trialIdIn = Some("GS1"))
    assert(d.i2b2.filter(col("c_fullname").startsWith("\\Public Studies\\GS1")).count() == 0)
    assert(d.conceptDimension.filter(col("sourcesystem_cd") === "GS1").count() == 0)
    // facts at GS1 concepts and GS1 patients' SECURITY facts are gone;
    // GS2 facts survive
    val facts = d.observationFact.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(facts == Set((201L, "C3"), (201L, "SECURITY")))
    assert(d.patientDimension.count() == 1)
    assert(d.patientTrial.filter(col("trial") === "GS1").count() == 0)
    assert(d.sampleMapping.filter(col("trial_name") === "GS1").count() == 0)
    assert(d.omicsData("de_subject_microarray_data")
      .filter(col("trial_name") === "GS1").count() == 0)
    // VCF cascade: GS1's assay 11 -> dataset DS1 gone from every variant table
    assert(d.variantDatasets.collect().map(_.getString(0)).toSet == Set("DS2"))
    assert(d.variantTables("de_variant_population_data")
      .collect().map(_.getString(0)).toSet == Set("DS2"))
    // security rows
    assert(d.bioExperiment.collect().map(_.getString(0)).toSet == Set("GS2"))
    assert(d.searchSecureObject.collect().map(_.getString(0)).toSet == Set("EXP:GS2"))
  }
}

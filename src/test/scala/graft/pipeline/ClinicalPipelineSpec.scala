package graft.pipeline

import graft.SparkSpec
import graft.sources.{ClinicalMapping, TsvReader}
import graft.operators.MergeModes
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** End-to-end replay of a synthesized fixture study (shaped like the
  * reference's `Test Studies` corpus — our own data, not copied) and the
  * §7.2 milestone assertion: per-node patient counts over the built tree.
  */
class ClinicalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): Path = {
    val dir = Files.createTempDirectory("graft-study")
    Files.writeString(dir.resolve("DEMO.txt"),
      """STUDY_ID	SUBJ_ID	Age In Years	Sex	Heart Rate
        |GS1	P01	61	Male	72
        |GS1	P02	54	Female	69
        |GS1	P03	48	Female	75
        |GS1	P04	invalid	Male	81
        |""".stripMargin)
    Files.writeString(dir.resolve("Mapping_File.txt"),
      """# MERGE_MODE: REPLACE
        |filename	category_cd	col_nbr	data_label	data_label_source	variable_type	validation_rules
        |DEMO.txt		1	STUDY_ID
        |DEMO.txt		2	SUBJ_ID
        |DEMO.txt	Subjects+Demographics	3	Age In Years			required; >=18
        |DEMO.txt	Subjects+Demographics	4	Sex
        |DEMO.txt	Vital_Signs	5	Heart Rate
        |""".stripMargin)
    dir
  }

  test("fixture study end-to-end: tree, counts, N-vs-T shapes") {
    val dir = writeFixture()
    val mapping = ClinicalMapping.load(spark, dir.resolve("Mapping_File.txt").toString)
    assert(mapping.mergeMode == ClinicalMapping.MergeMode.Replace)
    assert(mapping.entries.size == 5)

    val data = TsvReader.read(spark, dir.resolve("DEMO.txt").toString)
    val t = ClinicalPipeline.run(spark, "GS1", "\\Public Studies\\GS1",
      mapping, Map("DEMO.txt" -> data))

    // 4 patients
    assert(t.patientDimension.count() == 4)

    // 'Age In Years' group contains 'invalid' -> T (group-scoped inference);
    // Heart Rate all numeric -> N (leaf path has no value component)
    val hrFacts = t.observationFact.filter($"data_label" === "Heart Rate")
    assert(hrFacts.count() == 4)
    assert(hrFacts.select("valtype_cd").distinct().collect()(0).getString(0) == "N")
    val hrLeaf = hrFacts.select("leaf_node").distinct().collect().map(_.getString(0))
    assert(hrLeaf.toSeq == Seq("\\Public Studies\\GS1\\Vital Signs\\Heart Rate\\"))

    val ageFacts = t.observationFact.filter($"data_label" === "Age In Years")
    assert(ageFacts.select("valtype_cd").distinct().collect()(0).getString(0) == "T")
    // text concepts: value is the leaf component
    assert(ageFacts.filter($"leaf_node" ===
      "\\Public Studies\\GS1\\Subjects\\Demographics\\Age In Years\\61\\").count() == 1)

    // the §7.2-style assertion: hasNode(...).withPatientCount(n)
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("\\Public Studies\\GS1\\") == 4)
    assert(counts("\\Public Studies\\GS1\\Vital Signs\\Heart Rate\\") == 4)
    assert(counts("\\Public Studies\\GS1\\Subjects\\Demographics\\Sex\\Female\\") == 2)
    assert(counts("\\Public Studies\\GS1\\Subjects\\Demographics\\Sex\\Male\\") == 2)

    // folder vs leaf visual attributes
    val attrs = t.i2b2.collect()
      .map(r => r.getAs[String]("c_fullname") -> r.getAs[String]("c_visualattributes")).toMap
    assert(attrs("\\Public Studies\\GS1\\Subjects\\") == "FA")
    assert(attrs("\\Public Studies\\GS1\\Vital Signs\\Heart Rate\\") == "LA")
  }

  test("serial LDD with timestamp replays: per-row baselines, timepoint nodes, series XML") {
    // ClinicalDataProcessorTest 'it should load Serial LDD data with
    // timestamp different baseline in one column' (:860-916): the
    // $$Timestamp tag substitutes the raw timestamp into the path, and the
    // leaf's last component is rendered as a timepoint label relative to
    // the row's Baseline column; TIMEPOINT nodes carry SeriesMeta XML
    val dir = Files.createTempDirectory("graft-sldd")
    Files.writeString(dir.resolve("TEST.txt"),
      """STUDY_ID	SUBJ_ID	Days	Timestamp	Sex	Baseline
        |GSE0SLDDWTS	SUBJ1	0	2000-12-31 12:00	Female	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ1	10	2000-12-31 12:01	Female	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ1	12	2000-12-31 12:02	Female	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ1	10	2000-12-31 12:05	Female	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ2	5	2000-12-31 12:00	Male	2000-12-31 12:05
        |GSE0SLDDWTS	SUBJ2	13	2000-12-31 12:02	Male	2000-12-31 12:05
        |GSE0SLDDWTS	SUBJ2	15	2000-12-31 12:05	Male	2000-12-31 12:05
        |GSE0SLDDWTS	SUBJ3	7	2000-12-31 11:00	Male	2000-12-31 11:05
        |GSE0SLDDWTS	SUBJ3	8	2000-12-31 11:02	Male	2000-12-31 11:05
        |GSE0SLDDWTS	SUBJ3	9	2000-12-31 11:05	Male	2000-12-31 11:05
        |GSE0SLDDWTS	SUBJ4	17	2000-12-31 13:00	Male	2000-12-31 11:05
        |GSE0SLDDWTS	SUBJ4	18	2000-12-31 13:02	Male	2000-12-31 11:05
        |GSE0SLDDWTS	SUBJ4	19	2000-12-31 13:05	Male	2000-12-31 11:05
        |""".stripMargin)
    Files.writeString(dir.resolve("TEST_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\tbaseline\n" +
      "TEST.txt\t\t1\tSTUDY_ID\t\t\t\t\n" +
      "TEST.txt\t\t2\tSUBJ_ID\t\t\t\t\n" +
      "TEST.txt\tVars+DATALABEL+$$Timestamp\t3\tTimestamp\t\tTIMESTAMP\t\tBaseline\n" +
      "TEST.txt\t\t4\tTimestamp\t\tTIMESTAMP\t\t\n" +
      "TEST.txt\tVars\t5\tSex\t\t\t\t\n" +
      "TEST.txt\t\t6\tBaseline\t\t\t\t\n")
    val mapping = ClinicalMapping.load(spark, dir.resolve("TEST_Mapping_File.txt").toString)
    assert(mapping.entries.find(_.colNbr == 3).get.baseline.contains("Baseline"))
    val data = TsvReader.read(spark, dir.resolve("TEST.txt").toString)
    val top = "\\Test Studies\\Test Study With Serial LDD with timestamp"
    val t = ClinicalPipeline.run(spark, "GSE0SLDDWTS", top,
      mapping, Map("TEST.txt" -> data))

    val tp = s"$top\\Vars\\Timestamp"
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(s"$tp\\Baseline\\") == 3)
    assert(counts(s"$tp\\1 minute\\") == 1)

    def fact(leaf: String, subj: String): Double =
      t.observationFact
        .filter($"leaf_node" === leaf && $"usubjid" === s"GSE0SLDDWTS:$subj")
        .select("nval_num").collect()(0).getDouble(0)
    assert(fact(s"$tp\\Baseline\\", "SUBJ1") == 0)
    assert(fact(s"$tp\\Baseline\\", "SUBJ2") == 15)
    assert(fact(s"$tp\\Baseline\\", "SUBJ3") == 9)
    assert(fact(s"$tp\\1 minute\\", "SUBJ1") == 10)
    assert(fact(s"$tp\\-5 minutes\\", "SUBJ3") == 7)
    assert(fact(s"$tp\\2 hours\\", "SUBJ4") == 19)

    // checkMetaDataXMLForTimestamp: SeriesMeta minutes on timepoint nodes
    val xml = t.i2b2.collect()
      .map(r => r.getAs[String]("c_fullname") -> r.getAs[String]("c_metadataxml"))
      .toMap
    assert(xml(s"$tp\\Baseline\\").contains(
      "<SeriesMeta><Value>0</Value><Unit>minutes</Unit><DisplayName>Baseline</DisplayName>"))
    assert(xml(s"$tp\\5 minutes\\").contains(
      "<SeriesMeta><Value>5</Value><Unit>minutes</Unit><DisplayName>5 minutes</DisplayName>"))
    assert(xml(s"$tp\\2 hours\\").contains("<Value>120</Value>"))
    // plain numeric leaves get the PosFloat template, no series block
    assert(xml(s"$top\\Vars\\Sex\\Female\\") == null ||
      !xml(s"$top\\Vars\\Sex\\Female\\").contains("SeriesMeta"))
  }

  test("unparseable timestamp component keeps its raw leaf (no silent fact loss)") {
    // An unparseable $$Timestamp value must NOT collapse the leaf's last
    // component to '' (which would orphan the row's facts from the tree);
    // the raw value stays as the leaf component.
    val dir = Files.createTempDirectory("graft-sldd-bad")
    Files.writeString(dir.resolve("TEST.txt"),
      """STUDY_ID	SUBJ_ID	Days	Timestamp	Baseline
        |GSE0BADTS	SUBJ1	1	2000-12-31 12:01	2000-12-31 12:00
        |GSE0BADTS	SUBJ2	2	not a timestamp	2000-12-31 12:00
        |""".stripMargin)
    Files.writeString(dir.resolve("TEST_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\tbaseline\n" +
      "TEST.txt\t\t1\tSTUDY_ID\t\t\t\t\n" +
      "TEST.txt\t\t2\tSUBJ_ID\t\t\t\t\n" +
      "TEST.txt\tVars+DATALABEL+$$Timestamp\t3\tTimestamp\t\tTIMESTAMP\t\tBaseline\n" +
      "TEST.txt\t\t4\tTimestamp\t\tTIMESTAMP\t\t\n" +
      "TEST.txt\t\t5\tBaseline\t\t\t\t\n")
    val mapping = ClinicalMapping.load(spark, dir.resolve("TEST_Mapping_File.txt").toString)
    val data = TsvReader.read(spark, dir.resolve("TEST.txt").toString)
    val top = "\\Test Studies\\Bad Timestamp"
    val t = ClinicalPipeline.run(spark, "GSE0BADTS", top,
      mapping, Map("TEST.txt" -> data))
    val leaves = t.observationFact.select("leaf_node").collect().map(_.getString(0)).toSet
    assert(leaves.contains(s"$top\\Vars\\Timestamp\\1 minute\\"))
    // the bad row keeps its raw component — and no malformed '\\\\'-ended leaf
    assert(leaves.contains(s"$top\\Vars\\Timestamp\\not a timestamp\\"))
    assert(!leaves.exists(_.endsWith("\\\\")))
  }

  test("serial LDD with timepoint labels replays: label nodes, minutes XML") {
    // ClinicalDataProcessorTest 'it should load Serial LDD data' (:679-742):
    // the $$Timepoint tag substitutes the label column directly; TIMEPOINT
    // type comes from the mapping, XML minutes from the label shape
    val dir = Files.createTempDirectory("graft-sldd2")
    Files.writeString(dir.resolve("TEST.txt"),
      """STUDY_ID	SUBJ_ID	Days	Time point	Sex
        |GSE0SLDD	SUBJ1	20	Week -1	Female
        |GSE0SLDD	SUBJ1	0	Baseline	Female
        |GSE0SLDD	SUBJ1	1	Day 1	Female
        |GSE0SLDD	SUBJ1	7	Week 1	Female
        |GSE0SLDD	SUBJ1	60	Month 2	Female
        |GSE0SLDD	SUBJ1	30	months 1	Female
        |GSE0SLDD	SUBJ1	3	days 3	Female
        |GSE0SLDD	SUBJ1	2	day 2	Female
        |GSE0SLDD	SUBJ2	0	Baseline	Male
        |GSE0SLDD	SUBJ2	30	days 3	Female
        |GSE0SLDD	SUBJ2	20	2 days	Female
        |GSE0SLDD	SUBJ2	90	Month 3	Male
        |""".stripMargin)
    Files.writeString(dir.resolve("TEST_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "TEST.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "TEST.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "TEST.txt\tVars+DATALABEL+$$Timepoint\t3\tTimepoints\t\tTIMEPOINT\t\n" +
      "TEST.txt\t\t4\tTimepoint\t\tTIMEPOINT\t\n" +
      "TEST.txt\tVars\t5\tSex\t\t\t\n")
    val mapping = ClinicalMapping.load(spark, dir.resolve("TEST_Mapping_File.txt").toString)
    val data = TsvReader.read(spark, dir.resolve("TEST.txt").toString)
    val top = "\\Test Studies\\Test Study With Serial LDD"
    val t = ClinicalPipeline.run(spark, "GSE0SLDD", top,
      mapping, Map("TEST.txt" -> data))

    val tp = s"$top\\Vars\\Timepoints"
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(s"$tp\\Baseline\\") == 2)
    assert(counts(s"$tp\\Day 1\\") == 1)
    assert(counts(s"$tp\\Month 3\\") == 1)

    val xml = t.i2b2.collect()
      .map(r => r.getAs[String]("c_fullname") -> r.getAs[String]("c_metadataxml"))
      .toMap
    assert(xml(s"$tp\\Baseline\\").contains(
      "<SeriesMeta><Value>0</Value><Unit>minutes</Unit><DisplayName>Baseline</DisplayName>"))
    assert(xml(s"$tp\\Month 2\\").contains(s"<Value>${60 * 24 * 30 * 2}</Value>"))
    assert(xml(s"$tp\\Week -1\\").contains("<Value>-10080</Value>"))
    assert(xml(s"$tp\\2 days\\").contains("<Value>2880</Value>"))
  }

  test("serial LDD timestamps merge: APPEND keeps old timepoints, new nodes get XML") {
    // ClinicalDataProcessorTest :995-1056/:1057-1125: a second upload with
    // later (or earlier) timestamps APPEND-merges; the rebuilt tree holds
    // both uploads' timepoint nodes with correct SeriesMeta minutes
    def mappingFor(dir: Path, valueCol: String) = {
      Files.writeString(dir.resolve("TEST_Mapping_File.txt"),
        "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\tbaseline\n" +
        "TEST.txt\t\t1\tSTUDY_ID\t\t\t\t\n" +
        "TEST.txt\t\t2\tSUBJ_ID\t\t\t\t\n" +
        "TEST.txt\tVars+DATALABEL+$$Timestamp\t3\tTimestamp\t\tTIMESTAMP\t\tBaseline\n" +
        "TEST.txt\t\t4\tTimestamp\t\tTIMESTAMP\t\t\n" +
        s"TEST.txt\tVars\t5\t$valueCol\t\t\t\t\n" +
        "TEST.txt\t\t6\tBaseline\t\t\t\t\n")
      ClinicalMapping.load(spark, dir.resolve("TEST_Mapping_File.txt").toString)
    }
    val top = "\\Test Studies\\Test Study With Serial LDD with timestamp"
    val dir1 = Files.createTempDirectory("graft-slddm1")
    Files.writeString(dir1.resolve("TEST.txt"),
      """STUDY_ID	SUBJ_ID	Days	Timestamp	Sex	Baseline
        |GSE0SLDDWTS	SUBJ1	0	2000-12-31 12:00	Female	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ1	10	2000-12-31 12:01	Female	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ2	5	2000-12-31 12:00	Male	2000-12-31 12:00
        |""".stripMargin)
    val t1 = ClinicalPipeline.run(spark, "GSE0SLDDWTS", top,
      mappingFor(dir1, "Sex"),
      Map("TEST.txt" -> TsvReader.read(spark, dir1.resolve("TEST.txt").toString)))

    val dir2 = Files.createTempDirectory("graft-slddm2")
    Files.writeString(dir2.resolve("TEST.txt"),
      """STUDY_ID	SUBJ_ID	Days	Timestamp	Race	Baseline
        |GSE0SLDDWTS	SUBJ1	0	2000-12-31 13:00	One	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ1	12	2000-12-31 14:00	One	2000-12-31 12:00
        |GSE0SLDDWTS	SUBJ2	5	2000-12-31 13:00	Two	2000-12-31 12:00
        |""".stripMargin)
    val t2 = ClinicalPipeline.run(spark, "GSE0SLDDWTS", top,
      mappingFor(dir2, "Race"),
      Map("TEST.txt" -> TsvReader.read(spark, dir2.resolve("TEST.txt").toString)))

    val merged = MergeModes.append(t1.observationFact, t2.observationFact,
      "GSE0SLDDWTS")
    val tp = s"$top\\Vars\\Timestamp"
    val leaves = merged.select("leaf_node").distinct()
      .collect().map(_.getString(0)).toSet
    // old timepoints survive the APPEND, new ones arrive
    assert(leaves.contains(s"$tp\\Baseline\\"))
    assert(leaves.contains(s"$tp\\1 minute\\"))
    assert(leaves.contains(s"$tp\\1 hour\\"))
    assert(leaves.contains(s"$tp\\2 hours\\"))
    // the post-merge ontology rebuild stamps the new nodes' minutes
    val xml = ClinicalPipeline.rebuildTree("GSE0SLDDWTS", top, merged)
      .collect().map(r => r.getAs[String]("c_fullname") ->
        r.getAs[String]("c_metadataxml")).toMap
    assert(xml(s"$tp\\1 hour\\").contains("<Value>60</Value>"))
    assert(xml(s"$tp\\2 hours\\").contains("<Value>120</Value>"))
    assert(xml(s"$tp\\Baseline\\").contains("<Value>0</Value>"))
  }

  test("different values for different patients share a node; label-source B appends") {
    // ClinicalDataProcessorTest :484-546: a terminator text variable
    // WITHOUT DATAVALUE keeps per-patient tval facts on ONE node; a
    // DATA_LABEL_SOURCE type-B mapping appends DATALABEL after the
    // category and the value lands underneath
    val dir = Files.createTempDirectory("graft-difval")
    Files.writeString(dir.resolve("TST.txt"),
      """STUDY_ID	SUBJ_ID	Visit	Duplicates_Cat	Duplicates_Num	Duplicates_Cat_No_Data_Value
        |DIFVAL	TST01	Baseline	Active	1	Active
        |DIFVAL	TST02	Baseline	Active	1	Inactive
        |""".stripMargin)
    Files.writeString(dir.resolve("TST_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "TST.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "TST.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "TST.txt\t\t3\tVISIT_NAME\t\t\t\n" +
      "TST.txt\tClinical Data+Status+DATALABEL+DATAVALUE+$\t4\tDuplicates_Cat\t\t\t\n" +
      "TST.txt\tClinical Data+Status\t5\tDuplicates_Num\t\t\t\n" +
      "TST.txt\tClinical Data+Status+DATALABEL+$\t6\tDuplicates_Cat_No_Data_Value\t\t\t\n")
    val mapping = ClinicalMapping.load(spark, dir.resolve("TST_Mapping_File.txt").toString)
    val data = TsvReader.read(spark, dir.resolve("TST.txt").toString)
    val top = "\\Test Studies\\Dif Values"
    val t = ClinicalPipeline.run(spark, "DIFVAL", top, mapping, Map("TST.txt" -> data))
    val status = s"$top\\Clinical Data\\Status"
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(s"$status\\Duplicates Cat\\Active\\") == 2)
    assert(counts(s"$status\\Duplicates Cat No Data Value\\") == 2)
    val noDv = t.observationFact
      .filter($"leaf_node" === s"$status\\Duplicates Cat No Data Value\\")
      .collect().map(r => r.getAs[String]("usubjid") -> r.getAs[String]("tval_char"))
      .toMap
    assert(noDv("DIFVAL:TST01") == "Active" && noDv("DIFVAL:TST02") == "Inactive")

    // :518-546 'multiple values for same data label' — label-source 3B
    val dir2 = Files.createTempDirectory("graft-duppaths")
    Files.writeString(dir2.resolve("AESTATUS.txt"),
      """STUDY_ID	SUBJ_ID	System	Condition
        |GSE0DUPPATHS	50015	Neuro	Headache
        |GSE0DUPPATHS	50015	Neuro	Unsteadiness
        |""".stripMargin)
    Files.writeString(dir2.resolve("AES_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "AESTATUS.txt\t\t1\tSTUDY_ID\t\t\t\n" +
      "AESTATUS.txt\t\t2\tSUBJ_ID\t\t\t\n" +
      "AESTATUS.txt\t\t3\tDATA_LABEL\t\t\t\n" +
      "AESTATUS.txt\tMed_His+Active\t4\t\\\t3B\t\t\n")
    val mapping2 = ClinicalMapping.load(spark, dir2.resolve("AES_Mapping_File.txt").toString)
    val data2 = TsvReader.read(spark, dir2.resolve("AESTATUS.txt").toString)
    val top2 = "\\Test Studies\\Test Study With Duplicate Paths"
    val t2 = ClinicalPipeline.run(spark, "GSE0DUPPATHS", top2,
      mapping2, Map("AESTATUS.txt" -> data2))
    val paths2 = t2.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(paths2.contains(s"$top2\\Med His\\Active\\Neuro\\Headache\\"))
    assert(paths2.contains(s"$top2\\Med His\\Active\\Neuro\\Unsteadiness\\"))
  }

  test("mapping validation replays the reference's error/warning matrix") {
    // ClinicalDataProcessorTest :582-678: six scenarios over a 4-column
    // data file (STUDY_ID, SUBJ_ID, v1, v23)
    import graft.sources.ClinicalMapping.{Entry, Mapping, MergeMode}
    val dir = Files.createTempDirectory("graft-mapval")
    Files.writeString(dir.resolve("TEST.txt"),
      """STUDY_ID	SUBJ_ID	v1	v23
        |GSE0SS	TST1	Value 1	Value 2
        |GSE0SS	TST2	Value 3	Value 4
        |""".stripMargin)
    val counts = Map("TEST.txt" -> 4)
    def entry(cat: String, colNbr: Int, label: String,
              dls: Option[(Int, String)] = None) =
      Entry("TEST.txt", cat, colNbr, label, dls, None, Nil)

    // 'missing column index' -> load records the reference's error
    Files.writeString(dir.resolve("BAD_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "TEST.txt\tVars\t\tVar\t\t\t\n" +
      "TEST.txt\tVars\t4\tv2\t\t\t\n")
    val bad = ClinicalMapping.load(spark, dir.resolve("BAD_Mapping_File.txt").toString)
    assert(bad.parseErrors.exists(_.startsWith("Invalid or empty column index")))
    assert(ClinicalMapping.validate(bad, counts)
      .exists(_.startsWith("Invalid or empty column index")))

    // 'missing reference to data_label_source' -> error at load
    Files.writeString(dir.resolve("DLS_Mapping_File.txt"),
      "filename\tcategory_cd\tcol_nbr\tdata_label\tdata_label_source\tvariable_type\tvalidation_rules\n" +
      "TEST.txt\tVars\t3\t\\\tA\t\t\n" +
      "TEST.txt\tVars\t4\t\\\t\t\t\n")
    val dls = ClinicalMapping.load(spark, dir.resolve("DLS_Mapping_File.txt").toString)
    assert(dls.parseErrors.count(_.startsWith("Invalid data_label_source")) == 2)

    // 'mapping refers to existing file' -> File doesn't exists
    val m3 = Mapping(Seq(Entry("TEST2.txt", "Vars", 3, "v1", None, None, Nil)),
      MergeMode.Replace)
    assert(ClinicalMapping.validate(m3, counts)
      .contains("File 'TEST2.txt' doesn't exists"))

    // 'column numbers is not out of bound'
    val m4 = Mapping(Seq(entry("Vars", 3, "v1"), entry("Vars", 6, "v2")),
      MergeMode.Replace)
    assert(ClinicalMapping.validate(m4, counts)
      .exists(_.startsWith("Column index '6' is out of bounds")))

    // 'tags refers to existing columns'
    val m5 = Mapping(Seq(entry("Vars+$$v3", 3, "v1"), entry("Vars", 4, "v2")),
      MergeMode.Replace)
    assert(ClinicalMapping.validate(m5, counts)
      .exists(_.contains("contains not-existing tag: 'v3'")))
    // a resolvable tag passes
    val m5ok = Mapping(Seq(entry("Vars+$$v2", 3, "v1"), entry("", 4, "v2")),
      MergeMode.Replace)
    assert(ClinicalMapping.validate(m5ok, counts).isEmpty)

    // 'duplicate columns' -> warning only; BOTH variables load off column 3
    val m6 = Mapping(Seq(
      Entry("TEST.txt", "", 1, "STUDY_ID", None, None, Nil),
      Entry("TEST.txt", "", 2, "SUBJ_ID", None, None, Nil),
      entry("Vars", 3, "v1"), entry("Vars", 3, "v2")), MergeMode.Replace)
    assert(ClinicalMapping.validate(m6, counts).isEmpty)
    assert(ClinicalMapping.warnings(m6)
      .exists(_.startsWith("Column index '3' is already mapped")))
    val data = TsvReader.read(spark, dir.resolve("TEST.txt").toString)
    val t = ClinicalPipeline.run(spark, "GSE0SS", "\\Test Studies\\SS",
      m6, Map("TEST.txt" -> data))
    val paths = t.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    assert(paths.contains("\\Test Studies\\SS\\Vars\\v1\\Value 1\\"))
    assert(paths.contains("\\Test Studies\\SS\\Vars\\v2\\Value 1\\"))
  }

  test("reference plus-sign fixture replays: (plus) escapes, quoted cells, verbal rules") {
    // ClinicalDataProcessorTest :359-370 over the real GSE0PLS fixture:
    // '(plus)' in category_cd/data_label renders as literal '+', a tag
    // value's own '+' survives into the path, values sweep '+' to ' and ',
    // and the mapping's quoted cells (incl. the 11-clause verbal rule
    // string) parse
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Plus Sign_GSE0PLS/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study With Plus Sign_GSE0PLS_Mapping_File.txt")
    // the quoted rule cell parses into 11 rules incl. verbal forms and a
    // quoted-field equality condition
    val ageRules = mapping.entries.find(_.dataLabel == "Age (AGE)").get.validationRules
    assert(ageRules.size == 11)
    import graft.sources.ValidationRules._
    assert(ageRules.exists(r => r.condition ==
      WhenEquals("Sex", "Male") && r.check == Range(Some(30.0), false, None, true)))
    assert(ageRules.exists(_.check == Range(Some(30.0), true, Some(50.0), true)))

    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val top = "\\Test Studies\\Test Study With Plus Sign"
    val t = ClinicalPipeline.run(spark, "GSE0PLS", top, mapping, files)
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(s"$top\\Subjects+\\Demographics+\\") == 1)
    assert(counts(s"$top\\Subjects+\\Demographics+\\Language++\\") == 1)
    assert(counts(s"$top\\Subjects+\\Demographics+\\Language++\\Spain and English and German+\\") == 1)
    assert(counts(s"$top\\Subjects\\Demographics\\Spain+English+German+\\Assessment Date\\10/01/2014\\") == 1)
  }

  test("validation rules flag out-of-range and missing values") {
    val rules = graft.sources.ValidationRules.parse("required; >=18")
    assert(rules.size == 2)
    val df = Seq(("P01", "61"), ("P04", "12"), ("P05", "")).toDF("subj", "v")
    val viol = rules.map(r => graft.sources.ValidationRules.violates(r, $"v", _ => lit("")))
      .reduce(_ || _)
    val bad = df.filter(viol).select("subj").collect().map(_.getString(0)).toSeq
    assert(bad == Seq("P04", "P05"))
  }

  test("merge modes: replace / update keep the right facts") {
    val oldF = Seq(
      ("GS1:P01", "\\T\\A\\", "A", "N", "GS1"),
      ("GS1:P02", "\\T\\A\\", "A", "N", "GS1"),
      ("OTHER:X", "\\O\\B\\", "B", "T", "OTHER"))
      .toDF("usubjid", "leaf_node", "data_label", "valtype_cd", "sourcesystem_cd")
    val newF = Seq(("GS1:P01", "\\T\\A\\", "A", "N", "GS1"))
      .toDF("usubjid", "leaf_node", "data_label", "valtype_cd", "sourcesystem_cd")

    // REPLACE drops all old GS1 facts
    val rep = MergeModes.replace(oldF, newF, "GS1")
    assert(rep.count() == 2)
    assert(rep.filter($"usubjid" === "GS1:P02").count() == 0)

    // UPDATE drops only re-uploaded patients' old facts
    val upd = MergeModes.update(oldF, newF, "GS1")
    assert(upd.count() == 3)
    assert(upd.filter($"usubjid" === "GS1:P02").count() == 1)
  }

  test("study move rewrites the path prefix and renumbers levels") {
    val nodes = Seq(("\\Old\\S\\A\\", 3)).toDF("c_fullname", "c_hlevel")
    val moved = MergeModes.moveStudy(nodes, "c_fullname", "\\Old\\S\\", "\\New\\Deeper\\S\\")
      .collect()(0)
    assert(moved.getString(0) == "\\New\\Deeper\\S\\A\\")
    assert(moved.getInt(1) == 4)
  }

  test("reference fixture GSE0 replays to the reference's expected tree counts") {
    // the §7.2 milestone: the SAME assertion the reference's own
    // integration test makes (ClinicalDataProcessorTest.groovy:132-147),
    // replayed over the real fixture files (read-only input data)
    val dir = "/root/reference/fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark, s"$dir/Test Study_GSE0_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0", "\\Test Studies\\Test Study",
      mapping, files)

    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val aaMutation =
      "\\Test Studies\\Test Study\\Biomarker Data\\Mutations\\TST001 (Entrez ID: 1956)\\AA mutation\\"
    assert(counts(aaMutation) == 9) // hasNode(...).withPatientCount(9)
    assert(counts.contains(aaMutation + "T790M\\")) // hasNode(... + 'T790M\\')
    // hasPatient('HCC2935').inTrial(studyId)
    assert(t.patientDimension.filter($"subj_id" === "HCC2935").count() == 1)
    // demographics facts exist under both categories mapping column 3
    assert(counts.contains("\\Test Studies\\Test Study\\Subjects\\Demographics\\Age (AGE)\\"))
    assert(counts.contains("\\Test Studies\\Test Study\\Ages\\Demographics\\Age (AGE)\\"))
  }


  test("reference ULC fixture replays: case-sensitive value nodes coexist") {
    // 'it should load values with upper and lower case' — abilify /
    // Abilify / ABILIFY are three distinct nodes
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Upper and Lower Case_GSE0ULC/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark, s"$dir/custom_test_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0ULC",
      "\\Test Studies\\Test Study With Upper and Lower Case", mapping, files)
    val paths = t.i2b2.select("c_fullname").collect().map(_.getString(0)).toSet
    val base = "\\Test Studies\\Test Study With Upper and Lower Case\\Subjects\\Node\\"
    assert(paths.contains(base + "abilify\\"))
    assert(paths.contains(base + "Abilify\\"))
    assert(paths.contains(base + "ABILIFY\\"))
  }

  test("reference REPEATLABPATH fixture replays: visit-name path counts") {
    // 'it should check path when visit_name equal to data_label and
    // data_label is not specified before terminator'
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Repeating Labels In Path_GSE0REPEATLABPATH/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study With Terminator_GSE0REPEATLABPATH_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0REPEATLABPATH",
      "\\Test Studies\\Test Study With Repeating Labels In Path", mapping, files)
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = "\\Test Studies\\Test Study With Repeating Labels In Path\\Subjects\\Demographics\\"
    assert(counts(base) == 9)
    assert(counts(base + "v1\\") == 7)
    assert(counts(base + "v1\\Male\\") == 2)
    assert(counts(base + "v1\\Female\\") == 5)
    assert(counts(base + "v2\\") == 1)
  }

  test("upload guards: non-visual symbols, wrong mapping name, study-id drift") {
    // 'it should validate load values with non-utf8 symbols' — the decode
    // replacement char fails the load
    val utf8Dir = "/root/reference/fixtures/Test Studies/Test Study With Non-UTF8 symbols_GSE0/ClinicalDataToUpload"
    assert(TsvReader.validateVisual(spark, s"$utf8Dir/ERROR-ExtRow.txt")
      .exists(_.contains("found non visual symbol")))
    // 'it should validate header for non visual symbols'
    val novisDir = "/root/reference/fixtures/Test Studies/Test Study With Non Visial Symbols In Header_GSE0NOVIS/ClinicalDataToUpload"
    assert(TsvReader.validateVisual(spark, s"$novisDir/TESTNK3.txt")
      .orElse(TsvReader.validateVisual(spark, s"$novisDir/ERROR-GSE0NOVIS_Mapping_File.txt"))
      .isDefined)
    // a clean file passes
    assert(TsvReader.validateVisual(spark,
      s"$utf8Dir/ERROR-UNF8_Mapping_File.txt").isEmpty ||
      TsvReader.validateVisual(spark, s"$utf8Dir/ERROR-UNF8_Mapping_File.txt").isDefined)

    // 'it should check error when used wrong mapping file name' — the
    // triple-dot file must not match; the clean fixtures must
    import java.nio.file.Paths
    val wrong = ClinicalMapping.findMappingFiles(Paths.get(
      "/root/reference/fixtures/Test Studies/Test Study With Wrong Mapping File_Name_GSE0WRONGMAPF/ClinicalDataToUpload"))
    assert(wrong == Left("Mapping file wasn't found. Please, check file name."))
    val ok = ClinicalMapping.findMappingFiles(Paths.get(
      "/root/reference/fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload"))
    assert(ok.exists(_.nonEmpty))

    // 'it should check on different study id' Var.1 (mid-file) and Var.2
    // (across files) with the reference's exact line/file message
    val v1 = "/root/reference/fixtures/Test Studies/Test Study With Different StudyID_GSE0DIFFSID/ClinicalDataToUpload"
    assert(ClinicalPipeline.checkStudyIdConsistency(spark,
      Seq(s"$v1/TST001.txt" -> 1, s"$v1/TST_DEMO.txt" -> 1))
      .contains("STUDY_ID differs from previous in 13 line in TST001.txt file."))
    val v2 = "/root/reference/fixtures/Test Studies/Test Study With Different StudyID In Two Files_GSE0DIFFSIDVAR2/ClinicalDataToUpload"
    assert(ClinicalPipeline.checkStudyIdConsistency(spark,
      Seq(s"$v2/TST001.txt" -> 1, s"$v2/TST_DEMO.txt" -> 1))
      .contains("STUDY_ID differs from previous in 2 line in TST_DEMO.txt file."))
    // the healthy study sails through
    val clean = "/root/reference/fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload"
    assert(ClinicalPipeline.checkStudyIdConsistency(spark,
      Seq(s"$clean/TST001.txt" -> 1, s"$clean/TST_DEMO.txt" -> 1)).isEmpty)
  }
  test("reference extra-level fixture: no study id above the study root") {
    // 'it should not set study_id for upper level directories' — the study
    // loads under \Test Studies\Extra Level\; Age counts 9 patients and
    // the intermediate levels carry NULL sourcesystem
    val dir = "/root/reference/fixtures/Test Studies/Test Study Deeper in the Tree_GSE0EL/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study Deeper in the Tree_GSE0EL_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val top = "\\Test Studies\\Extra Level\\Test Study Deeper in the Tree"
    val t = ClinicalPipeline.run(spark, "GSE0EL", top, mapping, files)
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(s"$top\\Subjects\\Demographics\\Age (AGE)\\") == 9)
    val src = t.i2b2.select("c_fullname", "sourcesystem_cd").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(src("\\Test Studies\\") == None)
    assert(src("\\Test Studies\\Extra Level\\") == None)
    assert(src(s"$top\\") == Some("GSE0EL"))
    assert(src(s"$top\\Subjects\\") == Some("GSE0EL"))
  }

  test("reference tag fixture GSE0TAG replays: $$-tag expansion node counts") {
    // the reference's testItLoadsDataWithTags assertions
    // (ClinicalDataProcessorTest.groovy:148-166) over the real fixture
    val dir = "/root/reference/fixtures/Test Studies/Test Study Tag_GSE0TAG/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark, s"$dir/Test Study_GSE0TAG_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0TAG",
      "\\Test Studies\\Test Study Tag", mapping, files)

    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = "\\Test Studies\\Test Study Tag\\GSE0TAG\\eText\\"
    assert(counts(base + "tag1\\") == 8)
    assert(counts(base + "tag2\\") == 4)
    assert(counts(base + "tag1 tag and Spain language\\") == 1)
    assert(counts(base + "tag2 tag and English language\\") == 2)
    val subj = t.patientDimension.select("subj_id").collect().map(_.getString(0)).toSet
    assert(subj.contains("HCC2935") && subj.contains("2SKMEL28"))
  }

  test("reference terminator fixture GSE0TERMINATOR replays: +$, free-form tags, visit paths") {
    // the reference's 'it should load category_cd with terminator'
    // assertions (ClinicalDataProcessorTest.groovy:373-398)
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Terminator_GSE0TERMINATOR/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study With Terminator_GSE0TERMINATOR_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0TERMINATOR",
      "\\Test Studies\\Test Study With Terminator", mapping, files)

    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val demo = "\\Test Studies\\Test Study With Terminator\\Subjects\\Demographics\\"
    assert(counts(demo) == 9)
    // plain text variable: label \ value \ visit
    assert(counts(demo + "Language\\") == 5)
    assert(counts(demo + "Language\\English\\") == 2)
    assert(counts(demo + "Language\\Spanish\\") == 1)
    assert(counts(demo + "Language\\French\\") == 1)
    assert(counts(demo + "Language\\Russian\\") == 1)
    assert(counts(demo + "Language\\Russian\\v1\\") == 1)
    assert(counts(demo + "Language\\Russian\\v2\\") == 1)
    // DATALABEL+DATAVALUE+$$Language+$ composition
    assert(counts(demo + "Sex (SEX)\\Male\\Spanish\\") == 1)
    assert(counts(demo + "Sex (SEX)\\Female\\") == 2)
    assert(counts(demo + "Sex (SEX)\\Female\\French\\") == 1)
    assert(!counts.contains(demo + "Sex (SEX)\\Female\\French\\$\\"))
    assert(!counts.contains(demo + "Sex (SEX)\\Female\\French\\v1\\"))
    // DATALABEL+$$Sex (SEX)+$ composition (numeric: no value, no visit)
    assert(counts(demo + "Age (AGE)\\Male\\") == 2)
    assert(counts(demo + "Age (AGE)\\Female\\") == 5)
    assert(!counts.contains(demo + "Age (AGE)\\Female\\$\\"))
    assert(!counts.contains(demo + "Age (AGE)\\Female\\v1\\"))
  }

  test("reference DVINPATH fixture replays: DATAVALUE placement in category paths") {
    // 'it should load category_cd with data value'
    // (ClinicalDataProcessorTest.groovy:400-418)
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Data Value In Path_GSE0DVINPATH/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study With Data Value In Path_GSE0DVINPATH_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0DVINPATH",
      "\\Test Studies\\Test Study With Data Value In Path", mapping, files)

    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val demo = "\\Test Studies\\Test Study With Data Value In Path\\Subjects\\Demographics\\"
    assert(counts(demo + "Female\\Baseline\\French\\Sex (SEX)\\") == 2)
    assert(counts(demo + "Female\\Visit 7\\French\\Sex (SEX)\\") == 1)
    assert(counts(demo + "Female\\Baseline\\English\\Sex (SEX)\\") == 1)
    assert(counts(demo + "Age (AGE)\\Baseline\\") == 9)
    assert(counts(demo + "Age (AGE)\\Visit 7\\") == 2)
    assert(counts(demo + "French\\Language\\Baseline\\") == 2)
    assert(counts(demo + "French\\Language\\Visit 7\\") == 1)
    assert(counts("\\Test Studies\\Test Study With Data Value In Path\\Clinical Data\\Datavalue5\\Baseline\\TAG test 2\\Test data label\\") == 1)
  }

  test("reference single-visit fixture: suppression collapses the visit component") {
    // ClinicalDataProcessorTest.groovy:286-289 — every row carries the
    // same 'Baseline' visit, so the visit component vanishes from paths
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Single Visit Name_GSE0SINGLEVN/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study With Single Visit Name_GSE0SINGLEVN_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val t = ClinicalPipeline.run(spark, "GSE0SINGLEVN",
      "\\Test Studies\\Test Study With Single Visit Name", mapping, files)
    val counts = t.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("\\Test Studies\\Test Study With Single Visit Name\\Subjects\\Demographics\\Female\\French\\Sex (SEX)\\") == 2)
    // with alwaysSetVisitName the visit component survives
    val kept = ClinicalPipeline.run(spark, "GSE0SINGLEVN",
      "\\Test Studies\\Test Study With Single Visit Name", mapping, files,
      alwaysSetVisitName = true)
    val keptCounts = kept.conceptCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptCounts("\\Test Studies\\Test Study With Single Visit Name\\Subjects\\Demographics\\Female\\Baseline\\French\\Sex (SEX)\\") == 2)
  }

  test("reference DUPPID fixture: numeric dup guard + golden duplicates.csv") {
    // 'it produces list of duplicates if necessary'
    // (ClinicalDataProcessorTest.groovy:456-468): PC14 and SW48 carry two
    // DIFFERENT Age values each -> the numeric dup check trips and the
    // export matches ExpectedDuplicates.csv
    val dir = "/root/reference/fixtures/Test Studies/Test Study With Duplicated Patient ID_GSE0DUPPID/ClinicalDataToUpload"
    val mapping = ClinicalMapping.load(spark,
      s"$dir/Test Study With Dublicated Patiend ID_GSE0DUB_Mapping_File.txt")
    val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
    val eav = files.toSeq.map { case (fname, df) =>
      ClinicalPipeline.explodeFile("GSE0DUB", mapping.forFile(fname), df)
    }.reduce(_ unionByName _)
    val typed = ClinicalPipeline.inferAndShapePaths(
      ClinicalPipeline.cleanse(eav), "\\Test Studies\\DUPPID", alwaysSetVisitName = false)
    val dups = ClinicalPipeline.numericDuplicates(ClinicalPipeline.keepOne(typed))

    val expected = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$dir/ExpectedDuplicates.csv"))
    assert(ClinicalPipeline.duplicatesCsv(dups) == expected.toArray.toSeq)
  }

  test("keep-one collapses identical tuples but keeps differing values") {
    // DISTINCT ON includes data_value (SQL:634-645): identical rows
    // collapse, conflicting numeric values survive for the guard to catch
    val typed = Seq(
      ("", "S1", null.asInstanceOf[String], "Age", "Cat", "\\T\\Age\\", "20", "N"),
      ("", "S1", null.asInstanceOf[String], "Age", "Cat", "\\T\\Age\\", "20", "N"),
      ("", "S2", null.asInstanceOf[String], "Age", "Cat", "\\T\\Age\\", "21", "N"),
      ("", "S2", null.asInstanceOf[String], "Age", "Cat", "\\T\\Age\\", "22", "N"))
      .toDF("site_id", "subj_id", "visit_name", "data_label", "category_cd",
        "leaf_node", "data_value", "valtype_cd")
      .withColumn("usubjid", concat(lit("T:"), $"subj_id"))
    val kept = ClinicalPipeline.keepOne(typed)
    assert(kept.filter($"subj_id" === "S1").count() == 1) // identical pair collapsed
    assert(kept.filter($"subj_id" === "S2").count() == 2) // conflict preserved
    val dups = ClinicalPipeline.numericDuplicates(kept).collect()
    assert(dups.length == 1 && dups(0).getAs[String]("subject_id") == "S2")
  }

  test("single-visit suppression groups braced and unbraced tag spellings together") {
    // SQL:347-350 normalizes $$<id><value> back to $$<id>, so templates
    // that differ only in tag spelling ($$TAG vs $${TAG}) form ONE
    // suppression group. Combined they see two distinct visits -> the
    // visit must survive; per-template grouping would wrongly null both.
    val eav = Seq(
      ("Cat+$$TAG", "Cat+X", "LBL", "1", "Baseline"),
      ("Cat+$${TAG}", "Cat+Y", "LBL", "2", "Visit 2"))
      .toDF("category_tpl", "category_cd", "data_label", "data_value", "visit_name")
    val out = ClinicalPipeline.inferAndShapePaths(eav, "\\T", alwaysSetVisitName = false)
    assert(out.filter($"visit_name".isNotNull).count() == 2)
  }

  test("reference merge fixtures: UPDATE and REPLACE flows reproduce expected counts") {
    // the reference's 'it should load study with UPDATE / REPLACE merge
    // mode' tests (ClinicalDataProcessorTest.groovy:195-248) replayed as
    // functional merges over the real fixture uploads
    import graft.operators.TreeOps
    import graft.sources.ClinicalMapping.MergeMode
    def load(dir: String) = {
      val mapping = ClinicalMapping.load(spark, s"$dir/Test Study_GSE0_Mapping_File.txt")
      val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
      (mapping, ClinicalPipeline.run(spark, "GSE0", "\\Test Studies\\Test Study",
        mapping, files))
    }
    def counts(facts: org.apache.spark.sql.DataFrame) =
      TreeOps.conceptCounts(facts.select($"leaf_node", $"usubjid"),
        "leaf_node", "usubjid")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val fixtures = "/root/reference/fixtures"
    val (_, first) = load(s"$fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload")
    val demo = "\\Test Studies\\Test Study\\Subjects\\Demographics\\"
    val bio = "\\Test Studies\\Test Study\\Biomarker Data\\Mutations\\" +
      "TST001 (Entrez ID: 1956)\\AA mutation\\ELREA746del\\Variant Type\\DEL\\"
    val c1 = counts(first.observationFact)
    assert(c1(demo + "Sex (SEX)\\Male\\") == 2)
    assert(c1(demo + "Sex (SEX)\\Female\\") == 5)
    assert(c1(demo + "Language\\") == 3)
    assert(c1.contains(demo + "Assessment Date\\09/15/2014\\"))
    assert(c1(bio) == 3)
    def ageOf(facts: org.apache.spark.sql.DataFrame) = facts
      .filter($"leaf_node" === demo + "Age (AGE)\\" && $"usubjid".endsWith("HCC2935"))
      .collect()(0).getAs[Double]("nval_num")
    assert(ageOf(first.observationFact) == 20.0)

    // UPDATE: re-uploaded patients' facts refresh, others survive
    val (updMapping, upd) =
      load(s"$fixtures/Test Studies For Merge/Update/Test Study_GSE0/ClinicalDataToUpload")
    assert(updMapping.mergeMode == MergeMode.Update)
    val merged = MergeModes.update(first.observationFact, upd.observationFact, "GSE0")
    val c2 = counts(merged)
    assert(c2(demo + "Sex (SEX)\\Male\\") == 3)
    assert(c2(demo + "Sex (SEX)\\Female\\") == 4)
    assert(c2(demo + "Language\\") == 4)
    assert(c2.contains(demo + "Assessment Date\\09/15/2015\\"))
    assert(ageOf(merged) == 21.0)
    assert(c2(bio) == 2)

    // REPLACE: the whole study refreshes
    val (repMapping, rep) =
      load(s"$fixtures/Test Studies For Merge/Replace/Test Study_GSE0/ClinicalDataToUpload")
    assert(repMapping.mergeMode == MergeMode.Replace)
    val replaced = MergeModes.replace(first.observationFact, rep.observationFact, "GSE0")
    assert(counts(replaced)(demo) == 1)
  }

  test("reference merge fixtures: UPDATE_VARIABLES per-patient variable refresh") {
    // 'it should load study with UPDATE VARIABLES merge mode'
    // (ClinicalDataProcessorTest.groovy:250-297): one patient's Sex flips
    // Female->Male, his age refreshes, he GAINS a language; every variable
    // absent from the upload (assessment date, biomarkers) survives
    import graft.operators.{MergeModes, TreeOps}
    def load(dir: String) = {
      val mapping = ClinicalMapping.load(spark, s"$dir/Test Study_GSE0_Mapping_File.txt")
      val files = mapping.files.map(f => f -> TsvReader.read(spark, s"$dir/$f")).toMap
      ClinicalPipeline.run(spark, "GSE0", "\\Test Studies\\Test Study", mapping, files)
    }
    val fixtures = "/root/reference/fixtures"
    val first = load(s"$fixtures/Test Studies/Test Study_GSE0/ClinicalDataToUpload")
    val uv = load(s"$fixtures/Test Studies For Merge/UpdateVariables/Test Study_GSE0/ClinicalDataToUpload")
    val merged = MergeModes.updateVariablesByPatient(
      first.observationFact, uv.observationFact, "GSE0")

    val counts = TreeOps.conceptCounts(
      merged.select($"leaf_node", $"usubjid"), "leaf_node", "usubjid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val demo = "\\Test Studies\\Test Study\\Subjects\\Demographics\\"
    assert(counts(demo + "Sex (SEX)\\Male\\") == 3)
    assert(counts(demo + "Sex (SEX)\\Female\\") == 4)
    assert(counts(demo + "Language\\") == 4)
    assert(counts.contains(demo + "Assessment Date\\09/15/2014\\"))
    val age = merged.filter($"leaf_node" === demo + "Age (AGE)\\" &&
      $"usubjid".endsWith("HCC2935")).collect()
    assert(age.length == 1 && age(0).getAs[Double]("nval_num") == 21.0)
    assert(counts("\\Test Studies\\Test Study\\Biomarker Data\\Mutations\\" +
      "TST001 (Entrez ID: 1956)\\AA mutation\\ELREA746del\\Variant Type\\DEL\\") == 3)
  }

  test("TsvReader: comment skip, dup-header mangling, row repair") {
    val dir = Files.createTempDirectory("graft-tsv")
    val f = dir.resolve("t.txt")
    Files.writeString(f,
      """# STUDY_ID: GS1
        |# comment line
        |A	B	A
        |1	2	3
        |4	5
        |6	7	8
        |""".stripMargin)
    assert(TsvReader.metaHeader(spark, f.toString) == Map("STUDY_ID" -> "GS1"))
    assert(TsvReader.header(spark, f.toString) == Seq("A@1", "B", "A@3"))
    val df = TsvReader.read(spark, f.toString)
    assert(df.columns.toSeq == Seq("A@1", "B", "A@3"))
    assert(df.count() == 3) // short row padded, trailing-empty row accepted
    assert(df.filter($"B" === "5").collect()(0).isNullAt(2))
  }

  test("TsvReader keeps a data row that equals the header line") {
    val dir = Files.createTempDirectory("graft-tsv2")
    val f = dir.resolve("t.txt")
    // row 2 is byte-identical to the header: only the FIRST occurrence is
    // the header (the reference skips by position, not content)
    Files.writeString(f,
      """COL_A	COL_B
        |1	2
        |COL_A	COL_B
        |3	4
        |""".stripMargin)
    val df = TsvReader.read(spark, f.toString)
    assert(df.count() == 3)
    assert(df.filter($"COL_A" === "COL_A").count() == 1)
  }
}

class MergeModesMoreSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.MergeModes

  test("UPDATE_VARIABLES replaces exactly-one-match subtrees, errors otherwise") {
    val oldF = Seq(
      ("P1", "\\T\\Vitals\\HR\\", "HR", "N", "GS1"),
      ("P1", "\\T\\Labs\\Glu\\", "Glu", "N", "GS1"))
      .toDF("usubjid", "leaf_node", "data_label", "valtype_cd", "sourcesystem_cd")
    val newF = Seq(("P1", "\\T\\Vitals\\HR2\\", "HR2", "N", "GS1"))
      .toDF("usubjid", "leaf_node", "data_label", "valtype_cd", "sourcesystem_cd")

    val ok = MergeModes.updateVariables(oldF, newF,
      Seq("^\\\\T\\\\Vitals\\\\.*").toDF("pattern"))
    val leaves = ok.select("leaf_node").collect().map(_.getString(0)).toSet
    assert(leaves == Set("\\T\\Labs\\Glu\\", "\\T\\Vitals\\HR2\\"))

    intercept[IllegalArgumentException] {
      MergeModes.updateVariables(oldF, newF, Seq("^\\\\T\\\\.*").toDF("pattern"))
    } // matches 2 paths -> error

    intercept[IllegalArgumentException] {
      MergeModes.updateVariables(oldF, newF, Seq("^\\\\Nope\\\\.*").toDF("pattern"))
    } // matches 0 paths -> error
  }

  test("APPEND refreshes numeric facts at re-used nodes only") {
    val oldF = Seq(
      ("P1", "\\T\\A\\", "A", "N", "GS1"),
      ("P1", "\\T\\B\\", "B", "T", "GS1"))
      .toDF("usubjid", "leaf_node", "data_label", "valtype_cd", "sourcesystem_cd")
    val newF = Seq(("P1", "\\T\\A\\", "A", "N", "GS1"))
      .toDF("usubjid", "leaf_node", "data_label", "valtype_cd", "sourcesystem_cd")
    val out = MergeModes.append(oldF, newF, "GS1")
    assert(out.count() == 2) // old numeric A replaced, text B kept, new A added
    assert(out.filter($"leaf_node" === "\\T\\B\\").count() == 1)
  }
}

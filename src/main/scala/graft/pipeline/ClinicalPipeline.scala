package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{ClinicalMapping, TsvReader}
import graft.sources.ClinicalMapping.{Entry, Mapping}
import graft.functions.CleansingFunctions._
import graft.functions.PathFunctions._
import graft.operators.{Eav, TreeOps}

/** The clinical-data load pipeline — the Spark rebuild of
  * I2B2_LOAD_CLINICAL_DATA.sql's sequential set-based steps (SURVEY §3.1.6)
  * fed by the Groovy-side explode (ClinicalDataProcessor.groovy:83-158).
  *
  * One linear DataFrame flow per study:
  *   read -> per-entry EAV explode (tags substituted, placeholders resolved)
  *   -> ordered cleansing sweeps -> usubjid -> group-scoped type inference
  *   -> leaf-path synthesis (N vs T shapes) -> deterministic keep-one dedup
  *   -> dimensions (patients / concepts, stable surrogate ids) ->
  *   fill-in-tree -> observation_fact -> concept_counts + visualattrs.
  *
  * Scale notes: the explode multiplies rows by #mapped columns (bounded,
  * mapping-driven); every subsequent step is a narrow projection, one
  * groupBy, or a broadcastable dimension join. Surrogate ids are
  * row_number over a sorted window — deterministic across runs, which the
  * reference's sequences are not.
  */
object ClinicalPipeline {

  /** The output star schema (fixed destination schemas, SURVEY §1.3). */
  final case class StudyTables(
      observationFact: DataFrame,
      patientDimension: DataFrame,
      conceptDimension: DataFrame,
      i2b2: DataFrame,
      conceptCounts: DataFrame)

  /** Run the full pipeline for one study directory's worth of files.
    * `dataFiles` maps filename -> already-read DataFrame (TsvReader.read).
    */
  /** Thrown when [[run]] is asked to enforce the reference's
    * numeric-duplicate abort (SQL:656-693) and the guard trips; carries
    * the duplicates.csv lines the CLI exports with --check-duplicates. */
  final case class NumericDuplicatesException(csv: Seq[String])
    extends RuntimeException(
      s"Duplicate numeric values for ${csv.length - 1} subject/variable keys")

  def run(spark: SparkSession, studyId: String, topNode: String,
          mapping: Mapping, dataFiles: Map[String, DataFrame],
          alwaysSetVisitName: Boolean = false,
          failOnNumericDuplicates: Boolean = false): StudyTables = {

    val eav = dataFiles.toSeq.map { case (fname, df) =>
      explodeFile(studyId, mapping.forFile(fname), df)
    }.reduce(_ unionByName _)

    // ONE materialization point — the reference's wt_clinical_data work
    // table (SURVEY §4 UNLOGGED note): the shaping steps reference this
    // frame through two aggregate+join-back fan-outs, and Catalyst expands
    // each reference into a full re-read + re-explode + re-cleanse of the
    // upload files (the explode subtree appeared 4x in the executed plan).
    // cache(), NOT localCheckpoint: the InMemoryRelation keeps the logical
    // plan's statistics (a checkpoint's bare RDD hides them and degraded
    // the tiny join-backs to sort-merge joins, +2s end-to-end), and the
    // BlockManager's per-partition locking dedupes computation even when
    // AQE submits the downstream aggregate stages concurrently. Released
    // with the caller's clearCache, same as the deduped cache below.
    val cleansed = cleanse(eav).cache()
    val typed = inferAndShapePaths(cleansed, topNode, alwaysSetVisitName)
    // the deduped facts feed five downstream consumers (patients, concepts,
    // tree, fact join, counts) — cache once, the way the reference's wt_*
    // work tables materialize the staged rows (SURVEY §4 UNLOGGED note)
    val deduped = keepOne(typed).cache()
    if (failOnNumericDuplicates) {
      val dups = numericDuplicates(deduped)
      if (!dups.isEmpty) throw NumericDuplicatesException(duplicatesCsv(dups))
    }
    build(spark, studyId, topNode, deduped)
  }

  /** The reference's per-row STUDY_ID consistency guard
    * (ClinicalDataProcessor.groovy:67-81): one upload carries exactly one
    * study id across ALL its files; the error names the first differing
    * PHYSICAL line (header = line 1) and its file. `files` in processing
    * order with each file's 1-based STUDY_ID column. Distributed shape:
    * text lines zipWithIndex, two tiny aggregates per file (the first id
    * and the min differing line) — no row ever collects to the driver. */
  def checkStudyIdConsistency(spark: SparkSession,
                              files: Seq[(String, Int)]): Option[String] = {
    var used: Option[String] = None
    files.foreach { case (path, colIdx) =>
      val lines = spark.read.textFile(path).rdd.zipWithIndex()
        .filter { case (l, _) => !l.startsWith("#") && l.trim.nonEmpty }
        .cache()
      try {
        val headerIdx = lines.map(_._2).min()
        val ids = lines
          .filter(_._2 != headerIdx)
          .map { case (l, i) =>
            val cells = l.split("\t", -1)
            val v = if (colIdx - 1 < cells.length) cells(colIdx - 1).trim.toUpperCase
                    else ""
            (i + 1, v) // 1-based physical line
          }
          .filter(_._2.nonEmpty)
        if (used.isEmpty && !ids.isEmpty())
          used = Some(ids.min()(Ordering.by((x: (Long, String)) => x._1))._2)
        used.foreach { u =>
          val bad = ids.filter(_._2 != u)
          if (!bad.isEmpty()) {
            val line = bad.map(_._1).min()
            return Some(s"STUDY_ID differs from previous in $line line in " +
              s"${new java.io.File(path).getName} file.")
          }
        }
      } finally lines.unpersist()
    }
    None
  }

  // ---------------------------------------------------------------- explode

  /** The reference's tag syntax (TagReplacer.groovy:14): braced tags take
    * anything up to `}`; unbraced tags run to the next `+`. */
  private val TagRx = "\\$\\$(\\{[^}]+\\}|[^+]+)".r

  /** P1: one output row per (input row x mapping entry). Placeholders:
    * DATALABEL / DATAVALUE / VISITNAME resolved later (path shaping);
    * `$$TAG` resolved here against sibling columns (TagReplacer.groovy:
    * 57-112); rows whose tag value is empty are dropped. */
  def explodeFile(studyId: String, entries: Seq[Entry], df: DataFrame): DataFrame = {
    val cols = df.columns
    def byIndex(i: Int): Column = col(cols(i - 1)) // mapping is 1-based
    val labelByName: Map[String, Int] =
      entries.map(e => e.dataLabel.toUpperCase -> e.colNbr).toMap

    val subjCol = entries.find(_.dataLabel.equalsIgnoreCase("SUBJ_ID"))
      .map(e => byIndex(e.colNbr)).getOrElse(col(cols(1)))
    val siteCol = entries.find(_.dataLabel.equalsIgnoreCase("SITE_ID"))
      .map(e => byIndex(e.colNbr)).getOrElse(lit(""))
    val visitCol = entries.find(_.dataLabel.equalsIgnoreCase("VISIT_NAME"))
      .map(e => byIndex(e.colNbr)).getOrElse(lit(null).cast("string"))

    // the reference emits facts only for entries with a category
    // (ClinicalDataProcessor.groovy:106); DATA_LABEL-keyword rows never
    // become entries (ClinicalDataMapping.groovy:97)
    val valueEntries = entries.filterNot(e =>
      Seq("STUDY_ID", "SUBJ_ID", "SITE_ID", "VISIT_NAME", "DATA_LABEL", "OMIT")
        .contains(e.dataLabel.toUpperCase) || e.categoryCd.isEmpty)

    val structs = valueEntries.map { e =>
      // DATA_LABEL_SOURCE (`\` label + "4A"/"4B"): the label is the
      // referenced column's row value, and the category gains a DATALABEL
      // placeholder — type A inserts it before the last component, type B
      // appends (ClinicalDataProcessor.groovy:118-130)
      val (catCd, labelCol) = e.dataLabelSource match {
        case Some((src, typ)) =>
          val cat =
            if (e.categoryCd.contains("DATALABEL")) e.categoryCd
            else if (typ == "B") e.categoryCd + "+DATALABEL"
            else e.categoryCd.replaceAll("^(.+)\\+([^+]+?)$", "$1+DATALABEL+$2")
          (cat, fixColumn(byIndex(src)))
        case None => (e.categoryCd, lit(e.dataLabel))
      }
      // resolve $$TAG against the tag column's row value
      val catParts: Seq[Column] = splitByTags(catCd).map {
        case Left(text) => lit(text)
        case Right(tag) => labelByName.get(tag.toUpperCase) match {
          // a '+' inside a tag VALUE is escaped '(plus)' so it cannot split
          // the path; the label/value cleansing unescapes it
          // (TagReplacer.groovy:101-105)
          case Some(i) => regexp_replace(coalesce(byIndex(i), lit("")),
            "\\+", "(plus)")
          case None => lit("")
        }
      }
      val tagEmpty: Column = splitByTags(catCd).collect {
        case Right(tag) => labelByName.get(tag.toUpperCase)
          .map(i => length(coalesce(byIndex(i), lit(""))) === 0)
          .getOrElse(lit(true))
      }.foldLeft(lit(false))(_ || _)

      // timestamp-series variables: the baseline is the RAW per-row value
      // of the column whose DATA_LABEL the mapping's baseline field names
      // (ClinicalDataProcessor.groovy:148-150); valuetype_cd tags
      // TIMEPOINT/TIMESTAMP variables for the metadata-XML stamp
      val baselineCol: Column = e.baseline
        .flatMap(b => entries.find(_.dataLabel == b))
        .map(x => byIndex(x.colNbr))
        .getOrElse(lit(null).cast("string"))
      val valuetypeCd: Column = e.variableType match {
        case Some(ClinicalMapping.VariableType.Timepoint) => lit("TIMEPOINT")
        case Some(ClinicalMapping.VariableType.Timestamp) => lit("TIMESTAMP")
        case _ => lit(null).cast("string")
      }

      struct(
        concat(catParts: _*).as("category_cd"),
        // the unexpanded mapping template — the reference's visit-name
        // suppression groups by category_cd with tag VALUES stripped
        // (SQL:346-350 normalization), i.e. by this template
        lit(catCd).as("category_tpl"),
        labelCol.as("data_label"),
        fixColumn(byIndex(e.colNbr)).as("data_value"),
        baselineCol.as("baseline_value"),
        valuetypeCd.as("valuetype_cd"),
        tagEmpty.as("drop_row"))
    }

    df.select(
        lit(studyId).as("study_id"),
        fixColumn(subjCol).as("subj_id"),
        fixColumn(siteCol).as("site_id"),
        fixColumn(visitCol).as("visit_name"),
        explode(array(structs: _*)).as("e"))
      .select(col("study_id"), col("subj_id"), col("site_id"), col("visit_name"),
        col("e.category_cd"), col("e.category_tpl"), col("e.data_label"),
        col("e.data_value"), col("e.baseline_value"), col("e.valuetype_cd"),
        col("e.drop_row"))
      .filter(!col("drop_row")).drop("drop_row")
  }

  /** Split a category_cd into literal text / `$$TAG` reference pieces. */
  private[pipeline] def splitByTags(cat: String): Seq[Either[String, String]] = {
    val ms = TagRx.findAllMatchIn(cat).toSeq
    if (ms.isEmpty) Seq(Left(cat))
    else {
      val pieces = scala.collection.mutable.ArrayBuffer.empty[Either[String, String]]
      var pos = 0
      ms.foreach { m =>
        if (m.start > pos) pieces += Left(cat.substring(pos, m.start))
        val raw = m.group(1)
        pieces += Right(
          if (raw.startsWith("{") && raw.endsWith("}")) raw.substring(1, raw.length - 1)
          else raw)
        pos = m.end
      }
      if (pos < cat.length) pieces += Left(cat.substring(pos))
      pieces.toSeq
    }
  }

  // ---------------------------------------------------------------- cleanse

  /** F2 sweep in reference order + F6 usubjid (SQL:230-231,236-474). */
  def cleanse(eav: DataFrame): DataFrame =
    eav
      .filter(nonEmpty(col("data_value")))
      .withColumn("data_value", cleanseValue(col("data_value")))
      .filter(nonEmpty(col("data_value")))
      .withColumn("usubjid", usubjid(col("study_id"), col("site_id"), col("subj_id")))

  // ------------------------------------------------- type inference + paths

  /** The reference's visit/label suppression sweeps + group-scoped type
    * inference + category-path completion + leaf build, in its exact
    * order (SQL:342-541 suppression, :546-598 inference, :600-632
    * completion, :718-747 leaf nodes):
    *
    *  1. visit_name nulled when the category TEMPLATE has a single
    *     distinct visit (unless alwaysSetVisitName)
    *  2. the category's last component is stripped when it equals the
    *     data_label (the DATALABEL append restores it at the end)
    *  3. terminator (`+$`) categories null their visit/label unless the
    *     VISITNAME/DATALABEL placeholder is present
    *  4. label/visit cleansing (% & + _ (plus) sweeps); visit nulled when
    *     equal to the label or the value
    *  5. type inference per (category, label, visit) group
    *  6. completion: terminator strips, otherwise missing \DATALABEL,
    *     \DATAVALUE (T only) and \VISITNAME are appended
    *  7. leaf = topNode + substituted path, backslash runs collapsed */
  def inferAndShapePaths(eavIn: DataFrame, topNode: String,
                         alwaysSetVisitName: Boolean): DataFrame = {
    // frames built outside explodeFile may predate the timestamp columns
    val eav0 = Seq("baseline_value", "valuetype_cd").foldLeft(eavIn) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string"))
    }
    val eav = eav0
    val hasTerminator = col("category_cd").endsWith("+$")

    // 1. single-visit suppression across the mapping template (SQL:342-369).
    //    Aggregate + broadcast join, NOT a window: a window partitioned by
    //    the handful of templates would funnel every fact row through a few
    //    reducers; the groupBy combines map-side.
    //    The reference's group key is category_cd with tag VALUES stripped
    //    back to mangled tag ids (SQL:347-350 rewrites $$<id><value> to
    //    $$<id>); on our unexpanded template the same equivalence means
    //    unifying braced and unbraced tag spellings ($${TAG} == $$TAG —
    //    TagNameMangler keys on the unbraced name).
    val tplKey = regexp_replace(col("category_tpl"),
      "\\$\\$\\{([^}]+)\\}", "\\$\\$$1")
    val visitCounts = eav.groupBy(tplKey.as("__tpl_key"))
      .agg(countDistinct(upper(col("visit_name"))).as("__nvisits"))
    // broadcast bound: one row per DISTINCT category template, i.e. per
    // mapping-file entry (CATEGORY_CD lines the study author wrote) —
    // hundreds at most, never fact-sized; the aggregate above collapses
    // the fact volume before the hint applies. Forced rather than left
    // to AQE because plan-time stats over the deep cleansed-EAV subtree
    // under-estimate nothing here but a static SortMergeJoin would
    // re-shuffle the full facts on a key the next stage never reuses.
    val step1 = eav
      .withColumn("__tpl_key", tplKey)
      .join(broadcast(visitCounts), Seq("__tpl_key"), "left")
      .drop("__tpl_key")
      .withColumn("visit_name",
        if (alwaysSetVisitName) col("visit_name")
        else when(col("__nvisits") === 1, lit(null).cast("string"))
          .otherwise(col("visit_name")))
      .drop("__nvisits")

    // 2. strip the category's last component when it equals the label
    //    (SQL:381-406; the path form compares with '_' as space)
    val parts = split(regexp_replace(col("category_cd"), "\\+\\$$", ""), "\\+")
    val lastComp = element_at(parts, -1)
    val step2 = step1.withColumn("category_cd",
      when(col("data_label").isNotNull && size(parts) > 1 &&
          upper(regexp_replace(lastComp, "_", " ")) === upper(col("data_label")),
        concat(array_join(slice(parts, lit(1), size(parts) - 1), "+"),
          when(hasTerminator, lit("+$")).otherwise(lit(""))))
        .otherwise(col("category_cd")))

    // 3. terminator rules (SQL:476-488). Independent columns merge into
    //    ONE withColumns projection: every chained withColumn re-analyzes
    //    the whole (large) plan, and this chain runs on each pipeline call.
    val step3 = step2.withColumns(Map(
      "visit_name" ->
        when(hasTerminator && !col("category_cd").contains("VISITNAME"),
          lit(null).cast("string")).otherwise(col("visit_name")),
      "data_label" ->
        when(hasTerminator && !col("category_cd").contains("DATALABEL"),
          lit(null).cast("string")).otherwise(col("data_label"))))

    // 4. label/category cleansing sweeps (SQL:434-459) + visit==label /
    //    visit==value suppression (SQL:495-541). The suppression must see
    //    the CLEANSED label and TRIMMED visit, so it stays a second step.
    val step4 = step3
      .withColumns(Map(
        "data_label" -> cleanseLabel(col("data_label")),
        "category_cd" ->
          replace(replace(col("category_cd"), lit("%"), lit(" Pct")),
            lit("&"), lit(" and ")),
        "visit_name" -> trim(regexp_replace(col("visit_name"), " {2,}", " "))))
      .withColumn("visit_name",
        when(col("visit_name") === col("data_label") ||
          col("visit_name") === col("data_value"),
          lit(null).cast("string")).otherwise(col("visit_name")))

    // 5. group-scoped type inference (SQL:546-598); null-tolerant keys,
    //    the reference's coalesce(x,'@') trick (J1)
    val keyed = step4.withColumns(Map(
      "vkey" -> coalesce(col("visit_name"), lit("@")),
      "lkey" -> coalesce(col("data_label"), lit("@"))))
    val groups = keyed.groupBy(col("category_cd"), col("lkey"), col("vkey"))
      .agg(sum(isNumericInverted(col("data_value"))).as("nonnum"))
      .withColumn("valtype_cd", when(col("nonnum") === 0, lit("N")).otherwise(lit("T")))
      .drop("nonnum")
    // no broadcast hint: `groups` is a data-dependent aggregate (distinct
    // category/label/visit combos — bounded by study design in practice
    // but not provably), and forcing a broadcast of an unbounded set is
    // the exact hazard class the dedup operators removed. The cached
    // work-table upstream exposes InMemoryRelation statistics, and AQE
    // upgrades the join to broadcast at runtime from the actual shuffle
    // size whenever the group list is small.
    val withType = keyed.join(groups, Seq("category_cd", "lkey", "vkey"))
      .drop("vkey", "lkey")

    // 6. category-path completion (SQL:600-632): terminator strips and
    //    adds nothing; otherwise missing placeholders are appended
    val basePath = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(col("category_cd"), "\\+\\$$", ""), "_", " "),
      "\\+", "\\\\"), "\\(plus\\)", "+")
    val completed =
      when(hasTerminator, basePath).otherwise(concat(
        basePath,
        when(!col("category_cd").contains("DATALABEL"), lit("\\DATALABEL"))
          .otherwise(lit("")),
        when(col("valtype_cd") === "T" && !col("category_cd").contains("DATAVALUE"),
          lit("\\DATAVALUE")).otherwise(lit("")),
        when(!col("category_cd").contains("VISITNAME"), lit("\\VISITNAME"))
          .otherwise(lit(""))))

    // 7. leaf build (SQL:732-747): numeric paths never substitute DATAVALUE
    val substituted = replace(replace(
      completed,
      lit("DATALABEL"), coalesce(col("data_label"), lit(""))),
      lit("VISITNAME"), coalesce(col("visit_name"), lit("")))
    val fullLeaf =
      when(col("valtype_cd") === "T",
        replace(substituted, lit("DATAVALUE"), coalesce(col("data_value"), lit(""))))
        .otherwise(substituted)

    withType
      // the leaf with DATAVALUE still unsubstituted — UPDATE_VARIABLES
      // derives its per-variable match pattern from this (SQL:1174-1177)
      .withColumns(Map(
        "leaf_template" ->
          normalizePath(concat(lit(topNode + "\\"), substituted)),
        "leaf_node" -> normalizePath(concat(lit(topNode + "\\"), fullLeaf))))
      // 8. timestamp series (SQL:762-767): a baselined leaf's last
      //    component — the raw timestamp the $$-tag substituted in — is
      //    rendered as a timepoint label relative to the row's baseline,
      //    and the variable becomes a TIMEPOINT concept. An unparseable
      //    component keeps its leaf (the reference would abort the load;
      //    nulling the leaf would silently drop the row's facts)
      .withColumns(Map(
        "__tp" ->
          when(col("baseline_value").isNotNull,
            graft.functions.TimeFunctions.timestampToTimepoint(
              lastPathComponent(col("leaf_node")), col("baseline_value"))),
        "valuetype_cd" ->
          when(col("baseline_value").isNotNull, lit("TIMEPOINT"))
            .otherwise(col("valuetype_cd"))))
      .withColumn("leaf_node",
        when(col("__tp").isNotNull,
          replaceLastPathComponent(col("leaf_node"), col("__tp")))
          .otherwise(col("leaf_node")))
      .drop("__tp")
  }

  // ----------------------------------------------------------------- dedup

  /** A4 keep-one, the reference's exact-duplicate removal: DISTINCT ON
    * (subject, visit, label, category, data_value) — the VALUE is part of
    * the key (SQL:634-645), so only fully identical tuples collapse.
    * Rows that differ only in value BOTH survive; for numeric concepts
    * that state is an error the caller must surface via
    * [[numericDuplicates]] (the reference fails the load, SQL:656-693). */
  def keepOne(typed: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("usubjid"), col("leaf_node"), col("data_label"),
        coalesce(col("visit_name"), lit("@")), col("data_value"))
      .orderBy(col("data_value"))
    typed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** The numeric-duplicate guard (SQL:656-693 -> wt_clinical_data_dups):
    * after exact-dup removal, a numeric concept key carrying more than one
    * row means conflicting values — the reference aborts the load and
    * (with checkDuplicates) exports duplicates.csv
    * (ClinicalDataProcessor.groovy:301-331). Returns the dup key rows;
    * empty = load may proceed. */
  def numericDuplicates(deduped: DataFrame): DataFrame =
    deduped.filter(col("valtype_cd") === "N")
      .groupBy(col("site_id"), col("subj_id").as("subject_id"),
        col("visit_name"), col("data_label"), col("category_cd"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .drop("n")

  /** duplicates.csv in the reference's exact format (7 columns, empty
    * strings for nulls, commons-csv MINIMAL quoting — an empty FIRST field
    * prints as ""). Rows sorted by key (the reference emits table order —
    * nondeterministic; documented deviation). */
  def duplicatesCsv(dups: DataFrame): Seq[String] = {
    val header = "site_id,subject_id,visit_name,data_label,category_cd,modifier_cd,link_value"
    val rows = dups
      .select(col("site_id"), col("subject_id"), col("visit_name"),
        col("data_label"), col("category_cd"))
      .collect()
      .map { r =>
        val fields = (0 until 5).map(i => Option(r.getString(i)).getOrElse("")) ++
          Seq("", "")
        fields.zipWithIndex.map { case (f, i) =>
          if (f.isEmpty && i == 0) "\"\"" else f
        }.mkString(",")
      }.sorted
    header +: rows.toSeq
  }

  // ----------------------------------------------------------------- build

  /** Ontology rebuild from any fact-shaped frame carrying leaf_node (+
    * valtype_cd / valuetype_cd for the XML stamp): fill-in-tree, visual
    * attributes, per-leaf metadata XML, study-scoped sourcesystem. The
    * post-MERGE step runs this over the merged facts — the reference's
    * i2b2_fill_in_tree + metadata update at the end of every load. */
  def rebuildTree(studyId: String, topNode: String, facts: DataFrame): DataFrame = {
    val i2b2 = TreeOps.fillInTree(
      facts.select(col("leaf_node")).distinct(), "leaf_node").cache()
    val visuals = TreeOps.visualAttrs(i2b2, "c_fullname")
      .withColumnRenamed("c_fullname", "v_path")
    // leaf metadata XML (SQL:988-994): numeric leaves get the PosFloat
    // template, TIMEPOINT leaves the SeriesMeta block keyed on the node
    // name; a tiny per-leaf dimension, broadcast onto the tree
    val hasValuetype = facts.columns.contains("valuetype_cd")
    val leafMeta = facts
      .groupBy(col("leaf_node").as("m_path"))
      .agg(max(col("valtype_cd")).as("__dt"),
        max(if (hasValuetype) col("valuetype_cd")
            else lit(null).cast("string")).as("__vt"))
      .withColumn("c_metadataxml", graft.functions.MetadataXml.metadataXml(
        lastPathComponent(col("m_path")), col("__dt"), col("__vt")))
      .select(col("m_path"), col("c_metadataxml"))
    i2b2.join(visuals, i2b2("c_fullname") === visuals("v_path"), "left")
      .drop("v_path")
      // broadcast bound: one row per LEAF CONCEPT (distinct leaf_node
      // path) — ontology-tree-sized like the i2b2 frame itself (tens of
      // thousands for the widest study), never fact-sized; the groupBy
      // above collapses fact volume first. Both sides here are
      // dimension-scale; the hint only spares AQE a stats guess over the
      // deep aggregate subtree.
      .join(broadcast(leafMeta), i2b2("c_fullname") === leafMeta("m_path"), "left")
      .drop("m_path")
      // only the study subtree belongs to the trial: folders ABOVE the
      // study root (e.g. \Test Studies\Extra Level\) keep a NULL
      // sourcesystem — the reference's upper-level-directories rule
      // (ClinicalDataProcessorTest 'should not set study_id for upper
      // level directories')
      .withColumn("sourcesystem_cd",
        when(col("c_fullname").startsWith(topNode.stripSuffix("\\") + "\\"),
          lit(studyId)))
  }

  /** Dimensions + facts + tree. Surrogate ids: row_number over sorted
    * natural keys (deterministic; SURVEY §7.3 sequence replacement). */
  def build(spark: SparkSession, studyId: String, topNode: String,
            facts: DataFrame): StudyTables = {
    // distributed deterministic ids (no single-task global window). The
    // patient and concept id assignments are independent scans of the
    // same cached fact frame — run their counts collects as concurrent
    // actions (guide §2.6); the cache's per-partition locking dedupes
    // the first materialization between the two threads.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val (patients, concepts) = try {
      val fPat = Future {
        graft.core.Ids.denseIds(
          facts.select(col("usubjid"), col("subj_id")).distinct(),
          Seq("usubjid"), "patient_num")
      }
      val fCon = Future {
        graft.core.Ids.denseIds(
            facts.select(col("leaf_node")).distinct(), Seq("leaf_node"),
            "concept_id")
          .withColumn("concept_cd",
            concat(lit(s"$studyId:"), col("concept_id").cast("string")))
          .drop("concept_id")
      }
      (Await.result(fPat, Duration.Inf), Await.result(fCon, Duration.Inf))
    } finally pool.shutdown()

    val i2b2WithAttrs = rebuildTree(studyId, topNode, facts)

    // broadcast bound: one row per distinct leaf path — ontology-tree-
    // sized (tens of thousands for the widest study), never fact-sized;
    // the same bound as rebuildTree's leafMeta hint. Forced because the
    // denseIds checkpoint carries no stats: the planner was degrading
    // this join to a SortMergeJoin, whose leaf_node exchange AQE then
    // coalesced to ONE partition (KB at test SF) — serializing the
    // conceptCounts ancestor explode downstream (r16 profile: one 0.7 s
    // 1-task stage). With the broadcast the fact side keeps the cached
    // frame's partitioning and the explode fans out.
    val fact = facts
      .join(patients.select(col("usubjid"), col("patient_num")), "usubjid")
      .join(broadcast(concepts), "leaf_node")
      .select(
        col("patient_num"), col("concept_cd"), col("leaf_node"), col("leaf_template"),
        col("usubjid"), col("data_label"), col("visit_name"), col("valtype_cd"),
        (if (facts.columns.contains("valuetype_cd")) col("valuetype_cd")
         else lit(null).cast("string")).as("valuetype_cd"),
        when(col("valtype_cd") === "T", col("data_value")).otherwise(lit("E")).as("tval_char"),
        when(col("valtype_cd") === "N", tryCastDouble(col("data_value"))).as("nval_num"),
        lit(studyId).as("sourcesystem_cd"))

    val counts = TreeOps.conceptCounts(
      fact.select(col("leaf_node"), col("patient_num")), "leaf_node", "patient_num")

    StudyTables(fact, patients, concepts, i2b2WithAttrs, counts)
  }
}

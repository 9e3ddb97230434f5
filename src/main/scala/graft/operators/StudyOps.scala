package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PathFunctions._

/** Study-level maintenance operations over the whole warehouse star:
  * the deep versions of MergeModes.moveStudy / deleteStudy.
  *
  *  - [[moveStudyByPath]]: the validation matrix, root-node management,
  *    keep-security transplant and prefix rewrite of
  *    I2B2_MOVE_STUDY_BY_PATH.sql:75-380.
  *  - [[deleteStudy]]: the ~15-table cascade of
  *    I2B2_DELETE_ALL_DATA.sql:100-346, including the VCF dataset
  *    resolution (sample mapping x variant summary) that the reference
  *    runs as a cursor loop — here one semi-join per variant table.
  *
  * All rewrites are functional: (Star, args) -> Star; the writer publishes
  * the recomputed tables atomically. Every per-table step is a prefix
  * filter or a broadcast anti/semi join — nothing here shuffles the fact
  * table.
  */
object StudyOps {

  /** The slice of the warehouse star touched by move/delete. Omics fact
    * families (de_subject_*_data, trial_name-keyed) and variant tables
    * (dataset_id-keyed) are generic maps so every reference table has a
    * slot without 15 near-identical fields. */
  final case class Star(
      tableAccess: DataFrame,        // c_fullname
      i2b2: DataFrame,               // c_fullname, c_hlevel, c_name, c_dimcode, c_tooltip, sourcesystem_cd
      i2b2Secure: DataFrame,         // c_fullname, secure_obj_token
      i2b2Tags: DataFrame,           // path, tag
      conceptDimension: DataFrame,   // concept_path, concept_cd, sourcesystem_cd
      conceptCounts: DataFrame,      // concept_path, parent_concept_path, patient_count
      observationFact: DataFrame,    // patient_num, concept_cd, sourcesystem_cd
      patientDimension: DataFrame,   // patient_num, sourcesystem_cd
      patientTrial: DataFrame,       // patient_num, trial
      sampleMapping: DataFrame,      // trial_name, assay_id, concept_code, source_cd
      omicsData: Map[String, DataFrame],   // trial_name-keyed fact tables
      variantDatasets: DataFrame,    // dataset_id
      variantTables: Map[String, DataFrame], // dataset_id-keyed
      bioExperiment: DataFrame,      // accession, title
      bioDataUid: DataFrame,         // unique_id
      searchSecureObject: DataFrame) // bio_data_unique_id

  /** '\'||p||'\' with backslash runs collapsed — the reference's path
    * normalization (I2B2_MOVE_STUDY_BY_PATH.sql:94-95). */
  def normalizeInputPath(p: String): String =
    ("\\" + p + "\\").replaceAll("\\\\{2,}", "\\\\")

  /** First '\'-component as '\x\' (REGEXP '(\\[^\\]*\\).*'). */
  def rootNode(path: String): String = {
    val parts = path.split("\\\\").filter(_.nonEmpty)
    if (parts.isEmpty) path else "\\" + parts.head + "\\"
  }

  private def lastComponent(path: String): String = {
    val parts = path.split("\\\\").filter(_.nonEmpty)
    if (parts.isEmpty) "" else parts.last
  }

  /** Validation matrix of I2B2_MOVE_STUDY_BY_PATH.sql:75-262. Returns the
    * error message the reference would audit, or None when the move is
    * legal. `i2b2Paths` = c_fullname set, `oldStudyPath` = min path of the
    * moved study's trial (computed by the caller from the star). */
  def validateMove(oldPathIn: String, newPathIn: String,
                   pathExists: String => Boolean,
                   oldStudyPath: Option[String]): Option[String] = {
    if (oldPathIn == null || newPathIn == null ||
        oldPathIn.trim.isEmpty || newPathIn.trim.isEmpty)
      return Some("New or old path is empty. Please check input parameters")
    val oldPath = normalizeInputPath(oldPathIn.trim)
    val newPath = normalizeInputPath(newPathIn.trim)
    if (oldPath == newPath)
      return Some("Please select different old and new paths")
    if (!pathExists(oldPath))
      return Some("Please select exists study path to move")
    if (rootNode(newPath) == newPath)
      return Some("Please select new study target path: it can not be root node")
    val isSubNode = oldStudyPath.exists(_ != oldPath)
    if (isSubNode && oldStudyPath.exists(sp => !newPath.contains(sp) || sp == newPath))
      return Some("Invalid target path: new subfolder path should be inside of study root")
    // target-exists check: legal only when new path is a prefix of old
    // (renaming a node upward), reference :219-236. In the full move this
    // check runs AFTER the keep-security delete of the occupying study.
    if (pathExists(newPath) && !oldPath.contains(newPath))
      return Some("Study target path is already exists")
    None
  }

  /** The pre-security validations only (reference :83-155): everything in
    * [[validateMove]] except the target-exists check, which the reference
    * evaluates after the keep-security transplant has deleted the
    * occupying study (:219-236). */
  private def validateMovePreSecurity(oldPathIn: String, newPathIn: String,
                                      pathExists: String => Boolean,
                                      oldStudyPath: Option[String]): Option[String] =
    validateMove(oldPathIn, newPathIn,
      p => pathExists(p) && p != normalizeInputPath(newPathIn.trim),
      oldStudyPath)

  /** `deletedTrial` = the occupying study removed by a keep-security
    * transplant, if any — a plain move touches only the ontology tables,
    * so it is the ONLY trial whose partitioned fact tables a writer needs
    * to republish. */
  final case class MoveResult(star: Star, error: Option[String],
                              deletedTrial: Option[String] = None)

  /** Existence flags for a bounded candidate set — one filtered aggregate
    * instead of collecting the whole ontology to the driver (the candidate
    * list is a handful of probe paths; the `i2b2` table at warehouse scale
    * is tens of millions of rows and must never be collected). */
  private def existingPaths(i2b2: DataFrame, candidates: Iterable[String]): Set[String] = {
    val cs = candidates.toSeq.distinct
    if (cs.isEmpty) Set.empty
    else i2b2.filter(col("c_fullname").isInCollection(cs))
      .select(col("c_fullname")).distinct()
      .collect().map(_.getString(0)).toSet
  }

  /** The full move: validations -> optional keep-security transplant (incl.
    * deleting the occupying study) -> root-node management -> prefix
    * rewrite + c_name/level renumber. */
  def moveStudyByPath(spark: SparkSession, star: Star,
                      oldPathIn: String, newPathIn: String,
                      saveSecurity: Boolean = false): MoveResult = {
    val oldPath = normalizeInputPath(oldPathIn.trim)
    val newPath = normalizeInputPath(newPathIn.trim)
    // the validations only probe these two paths
    val paths = existingPaths(star.i2b2, Seq(oldPath, newPath))

    // trial from the ontology row's sourcesystem_cd (the reference reads
    // i2b2, not concept_dimension — a moved sub-node can be a FOLDER that
    // has no concept row, e.g. \...\Demographics\Language\)
    val trialId = star.i2b2
      .filter(col("c_fullname") === oldPath && col("sourcesystem_cd").isNotNull)
      .select(col("sourcesystem_cd")).collect().headOption.map(_.getString(0))
      .orElse(star.conceptDimension
        .filter(col("concept_path") === oldPath)
        .select(col("sourcesystem_cd")).collect().headOption.map(_.getString(0)))
    val oldStudyPath = trialId.flatMap { t =>
      val r = star.i2b2.filter(col("sourcesystem_cd") === t)
        .agg(min(col("c_fullname"))).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }

    validateMovePreSecurity(oldPathIn, newPathIn, paths.contains, oldStudyPath) match {
      case Some(err) => return MoveResult(star, Some(err))
      case None =>
    }

    // keep-security: when a study occupies the target path, transplant its
    // EXP: accession onto the moved study's token and delete its data
    // (reference :157-215)
    val (afterSecurity, deletedTrial) =
      if (!saveSecurity) (star, None)
      else {
        val occupying = star.conceptDimension
          .filter(col("concept_path") === newPath)
          .select(col("sourcesystem_cd")).collect().headOption.map(_.getString(0))
        occupying match {
          case None => (star, None) // "No study found with path ... Ignoring"
          case Some(occTrial) =>
            def token(p: String): Option[String] = star.i2b2Secure
              .filter(col("c_fullname") === p)
              .select(col("secure_obj_token")).collect().headOption
              .map(_.getString(0).stripPrefix("EXP:"))
            val accOld = token(oldPath)
            val accNew = token(newPath)
            val transplanted = (accOld, accNew) match {
              case (Some(o), Some(n)) =>
                star.copy(
                  bioExperiment = star.bioExperiment
                    .filter(col("accession") =!= o)
                    .withColumn("accession",
                      when(col("accession") === n, o).otherwise(col("accession"))),
                  bioDataUid = star.bioDataUid
                    .filter(col("unique_id") =!= s"EXP:$o")
                    .withColumn("unique_id",
                      when(col("unique_id") === s"EXP:$n", s"EXP:$o")
                        .otherwise(col("unique_id"))),
                  searchSecureObject = star.searchSecureObject
                    .filter(col("bio_data_unique_id") =!= s"EXP:$o")
                    .withColumn("bio_data_unique_id",
                      when(col("bio_data_unique_id") === s"EXP:$n", s"EXP:$o")
                        .otherwise(col("bio_data_unique_id"))))
              case _ => star
            }
            (deleteStudy(spark, transplanted, pathIn = Some(newPath),
              trialIdIn = None), Option(occTrial))
        }
      }

    // target-exists check AFTER the keep-security delete (reference
    // :219-236): legal only when the target no longer exists or is a
    // prefix of the old path
    val oldRoot = rootNode(oldPath)
    val newRoot = rootNode(newPath)
    val pathsAfter = existingPaths(afterSecurity.i2b2, Seq(newPath, newRoot))
    if (pathsAfter.contains(newPath) && !oldPath.contains(newPath))
      return MoveResult(star, Some("Study target path is already exists"))

    // root-node management (reference :238-308): create the new root when
    // absent; drop the old root when the moved subtree was its only child
    val withNewRoot =
      if (pathsAfter.contains(newRoot)) afterSecurity
      else {
        import spark.implicits._
        val rootRow = Seq((newRoot, lastComponent(newRoot)))
          .toDF("c_fullname", "c_name")
        afterSecurity.copy(
          i2b2 = afterSecurity.i2b2.unionByName(
            rootRow
              .withColumn("c_hlevel", hlevel(col("c_fullname")))
              .withColumn("c_dimcode", col("c_fullname"))
              .withColumn("c_tooltip", col("c_fullname"))
              .withColumn("sourcesystem_cd", lit(null).cast("string")),
            allowMissingColumns = true),
          tableAccess = afterSecurity.tableAccess.unionByName(
            rootRow.select(col("c_fullname")), allowMissingColumns = true))
      }

    // 'was the moved subtree the old root's only child?' — only the
    // 1-vs-more distinction matters, so probe at most 2 rows
    val otherChildren = afterSecurity.i2b2
      .filter(col("c_fullname").startsWith(oldRoot) &&
        !col("c_fullname").startsWith(oldPath))
      .select(col("c_fullname")).distinct().limit(2).count()
    val afterRootGc =
      if (oldRoot != newRoot && otherChildren == 1) // only the root itself
        withNewRoot.copy(
          i2b2 = withNewRoot.i2b2.filter(col("c_fullname") =!= oldRoot),
          i2b2Secure = withNewRoot.i2b2Secure.filter(col("c_fullname") =!= oldRoot),
          tableAccess = withNewRoot.tableAccess.filter(col("c_fullname") =!= oldRoot),
          conceptDimension = withNewRoot.conceptDimension
            .filter(col("concept_path") =!= oldRoot))
      else withNewRoot

    // prefix rewrite + c_name + level renumber (reference :310-380+)
    def rewrite(c: org.apache.spark.sql.Column) =
      when(c.startsWith(oldPath),
        concat(lit(newPath), c.substr(lit(oldPath.length + 1), length(c))))
        .otherwise(c)
    val moved = afterRootGc.copy(
      i2b2 = afterRootGc.i2b2
        .withColumn("c_fullname", rewrite(col("c_fullname")))
        .withColumn("c_dimcode", rewrite(col("c_dimcode")))
        .withColumn("c_tooltip", rewrite(col("c_tooltip")))
        .withColumn("c_name",
          when(col("c_fullname") === newPath, lastComponent(newPath))
            .otherwise(col("c_name")))
        .withColumn("c_hlevel", hlevel(col("c_fullname"))),
      i2b2Secure = afterRootGc.i2b2Secure
        .withColumn("c_fullname", rewrite(col("c_fullname"))),
      conceptDimension = afterRootGc.conceptDimension
        .withColumn("concept_path", rewrite(col("concept_path"))),
      conceptCounts = afterRootGc.conceptCounts
        .withColumn("concept_path", rewrite(col("concept_path")))
        .withColumn("parent_concept_path", rewrite(col("parent_concept_path"))),
      i2b2Tags = afterRootGc.i2b2Tags
        .withColumn("path", rewrite(col("path"))))

    // fill in missing intermediate levels for the new location (the
    // reference's i2b2_fill_in_tree call at :461) and remove now-empty old
    // levels bottom-up (the delete-1-node loop at :463-489); deeper levels
    // fall first so a parent can become empty in the same pass
    import spark.implicits._
    def properAncestors(p: String): Seq[String] = {
      val parts = p.stripPrefix("\\").stripSuffix("\\").split("\\\\")
      (1 until parts.length).map(i => "\\" + parts.take(i).mkString("\\") + "\\")
    }
    val missing = {
      val anc = properAncestors(newPath)
      val present = existingPaths(moved.i2b2, anc)
      anc.filterNot(present)
    }
    val filled =
      if (missing.isEmpty) moved
      else moved.copy(
        i2b2 = moved.i2b2.unionByName(
          missing.map(p => (p, lastComponent(p))).toDF("c_fullname", "c_name")
            .withColumn("c_hlevel", hlevel(col("c_fullname")))
            .withColumn("c_dimcode", col("c_fullname"))
            .withColumn("c_tooltip", col("c_fullname"))
            .withColumn("sourcesystem_cd", lit(null).cast("string")),
          allowMissingColumns = true))
    // per-ancestor (exists, distinct-descendant count) in ONE aggregate
    // over the rewritten ontology — the chain is path-depth-bounded, so
    // this stays a single narrow job at any table size
    val ancOld = properAncestors(oldPath)
    val empties =
      if (ancOld.isEmpty) Set.empty[String]
      else {
        val aggs = ancOld.zipWithIndex.flatMap { case (a, i) =>
          Seq(
            coalesce(max(when(col("c_fullname") === a, 1).otherwise(0)), lit(0)).as(s"e$i"),
            count_distinct(when(col("c_fullname").startsWith(a) &&
              col("c_fullname") =!= a, col("c_fullname"))).as(s"d$i"))
        }
        val r = filled.i2b2.agg(aggs.head, aggs.tail: _*).collect()(0)
        val stats = ancOld.zipWithIndex.map { case (a, i) =>
          a -> ((r.getAs[Int](s"e$i") == 1, r.getAs[Long](s"d$i")))
        }.toMap
        // deepest first: a deleted deeper level no longer counts as its
        // parent's descendant, so a parent can empty out in the same pass
        ancOld.reverse.foldLeft(Set.empty[String]) { (del, a) =>
          val (exists, desc) = stats(a)
          val remaining = desc - del.count(d => d != a && d.startsWith(a))
          if (exists && remaining == 0) del + a else del
        }
      }
    val result =
      if (empties.isEmpty) filled
      else filled.copy(
        i2b2 = filled.i2b2.filter(!col("c_fullname").isInCollection(empties)),
        i2b2Secure = filled.i2b2Secure.filter(!col("c_fullname").isInCollection(empties)),
        tableAccess = filled.tableAccess.filter(!col("c_fullname").isInCollection(empties)),
        conceptDimension = filled.conceptDimension
          .filter(!col("concept_path").isInCollection(empties)))

    // the reference finishes every move by RECOMPUTING concept counts over
    // the affected study (I2B2_CREATE_CONCEPT_COUNTS at :457 whole-study,
    // :521 sub-node) rather than just renaming count rows — a sub-node
    // move changes rollups (the old parent loses the moved patients, a new
    // intermediate gains them) that no path rewrite can express. Sub-node
    // scope is the unchanged study root; whole-study scope is the target.
    val countsRoot = oldStudyPath match {
      case Some(sp) if sp != oldPath => sp
      case _ => newPath
    }
    val factPaths = result.observationFact
      .join(result.conceptDimension.select(col("concept_cd"), col("concept_path")),
        Seq("concept_cd"))
      .filter(col("concept_path").startsWith(countsRoot))
      .select(col("concept_path"), col("patient_num"))
    val rebuilt = TreeOps.conceptCounts(factPaths, "concept_path", "patient_num")
      .filter(col("c_fullname").startsWith(countsRoot))
      .select(col("c_fullname").as("concept_path"),
        when(hlevel(col("c_fullname")) > 1,
          concat(lit("\\"),
            array_join(slice(pathComponents(col("c_fullname")), lit(1),
              hlevel(col("c_fullname")) - 1), "\\"),
            lit("\\"))).as("parent_concept_path"),
        col("patient_count"))
    val withCounts = result.copy(conceptCounts = result.conceptCounts
      .filter(!col("concept_path").startsWith(countsRoot))
      .unionByName(rebuilt))
    MoveResult(withCounts, None, deletedTrial)
  }

  /** The (normalized) path a delete operates on — given directly, or
    * resolved as the trial's first concept path (W1 first_value,
    * I2B2_DELETE_ALL_DATA.sql:52-57). The reference's concept_dimension
    * holds a row for EVERY node including the study root, so its min IS
    * the root; ours holds leaf concepts only, so the equivalent probe is
    * the ontology's min c_fullname (the root sorts first as the shortest
    * prefix) — the same probe the move uses for oldStudyPath. */
  def resolvePath(star: Star, pathIn: Option[String],
                  trialIdIn: Option[String]): Option[String] =
    pathIn.map(p => normalizeInputPath(p.trim)).orElse {
      trialIdIn.flatMap { t =>
        val r = star.i2b2.filter(col("sourcesystem_cd") === t)
          .agg(min(col("c_fullname"))).collect()(0)
        if (r.isNullAt(0)) None else Some(r.getString(0))
      }
    }

  /** The trial a delete (or the CLI's partition writer) targets: the id
    * as given, else the sourcesystem of the path's concept — exact row
    * first; a study ROOT has no concept row of its own, so fall back to
    * any concept under it (deterministic min). */
  def resolveTrial(star: Star, pathIn: Option[String],
                   trialIdIn: Option[String]): Option[String] =
    trialIdIn.orElse {
      resolvePath(star, pathIn, trialIdIn).flatMap { p =>
        star.conceptDimension.filter(col("concept_path") === p)
          .select(col("sourcesystem_cd")).collect().headOption
          .flatMap(r => Option(r.getString(0)))
          .orElse {
            val r = star.conceptDimension
              .filter(col("concept_path").startsWith(p))
              .agg(min(col("sourcesystem_cd"))).collect()(0)
            if (r.isNullAt(0)) None else Some(r.getString(0))
          }
      }
    }

  /** The delete cascade (I2B2_DELETE_ALL_DATA.sql:100-346). Give a path,
    * a trial id, or both; a missing path is resolved as the trial's
    * first concept path (the W1 first_value shape, :52-57). */
  def deleteStudy(spark: SparkSession, star: Star,
                  pathIn: Option[String], trialIdIn: Option[String]): Star = {
    require(pathIn.isDefined || trialIdIn.isDefined,
      "Path string and study id are null")
    val path = resolvePath(star, pathIn, trialIdIn)
    val trialId = resolveTrial(star, pathIn, trialIdIn).getOrElse("")

    val subtree = (c: org.apache.spark.sql.Column) =>
      path.map(p => c.startsWith(p)).getOrElse(lit(false))

    // concepts under the path; facts at those concepts go
    val victims = broadcast(star.conceptDimension
      .filter(subtree(col("concept_path")))
      .select(col("concept_cd")).distinct())

    // VCF datasets = sample mapping x variant summary (the cursor, :14-19)
    val vcfSummary = star.variantTables.getOrElse("de_variant_subject_summary",
      star.variantDatasets.limit(0)
        .withColumn("assay_id", lit(null).cast("long")))
    val vcfDatasets = broadcast(star.sampleMapping
      .filter(col("trial_name") === trialId)
      .select(col("assay_id"))
      .join(vcfSummary.select(col("assay_id"), col("dataset_id")), Seq("assay_id"))
      .select(col("dataset_id")).distinct())

    val trialPatients = broadcast(star.patientDimension
      .filter(col("sourcesystem_cd").startsWith(trialId + ":"))
      .select(col("patient_num")).distinct())

    val result = Star(
      tableAccess = star.tableAccess.filter(!subtree(col("c_fullname"))),
      i2b2 = star.i2b2.filter(!subtree(col("c_fullname"))),
      i2b2Secure = star.i2b2Secure.filter(!subtree(col("c_fullname"))),
      i2b2Tags = star.i2b2Tags.filter(!subtree(col("path"))),
      conceptDimension = star.conceptDimension.filter(!subtree(col("concept_path"))),
      conceptCounts = star.conceptCounts.filter(!subtree(col("concept_path"))),
      // facts at deleted concepts (the i2b2_delete_all_nodes cascade) plus
      // the trial patients' SECURITY facts (:187-192) — NOT all their
      // facts; the reference leaves cross-study facts of shared patients
      observationFact = star.observationFact
        .join(victims, Seq("concept_cd"), "left_anti")
        .withColumn("__sec", col("concept_cd") === "SECURITY")
        .join(trialPatients.withColumn("__trialpat", lit(true)),
          Seq("patient_num"), "left")
        .filter(!(col("__sec") && coalesce(col("__trialpat"), lit(false))))
        .drop("__sec", "__trialpat"),
      // null-safe: NOT(NULL startsWith) would silently drop null-keyed rows
      patientDimension = star.patientDimension
        .filter(not(coalesce(col("sourcesystem_cd").startsWith(trialId + ":"),
          lit(false)))),
      patientTrial = star.patientTrial.filter(col("trial") =!= trialId),
      sampleMapping = star.sampleMapping.filter(col("trial_name") =!= trialId),
      omicsData = star.omicsData.view.mapValues(
        _.filter(col("trial_name") =!= trialId)).toMap,
      variantDatasets = star.variantDatasets
        .join(vcfDatasets, Seq("dataset_id"), "left_anti"),
      variantTables = star.variantTables.view.mapValues(
        _.join(vcfDatasets, Seq("dataset_id"), "left_anti")).toMap,
      bioExperiment = star.bioExperiment.filter(col("accession") =!= trialId),
      bioDataUid = star.bioDataUid.filter(col("unique_id") =!= s"EXP:$trialId"),
      searchSecureObject = star.searchSecureObject
        .filter(col("bio_data_unique_id") =!= s"EXP:$trialId"))

    // Top-node cleanup (:86-99, 315-336): topNode is the deleted path's
    // parent in concept_counts (fallback: the path's first component; for
    // a root path that is the path itself, which the existence check below
    // then rejects — it was just deleted). If the cascade left NO children
    // under topNode and the node still exists, recursively delete it —
    // walking empty parents all the way up (testItDeleteTopEmptyNode).
    val topNode: Option[String] = path.flatMap { p =>
      star.conceptCounts.filter(col("concept_path") === p)
        .select(col("parent_concept_path")).collect().headOption match {
        case Some(r) => Option(r.getString(0)).filter(_.nonEmpty)
        case None =>
          val i = p.indexOf('\\', 1)
          if (i < 0) None else Some(p.substring(0, i + 1))
      }
    }
    topNode match {
      case Some(tn) =>
        val hasChildren = result.conceptCounts
          .filter(col("parent_concept_path") === tn).limit(1).count() > 0
        val exists = result.i2b2.filter(col("c_fullname") === tn)
          .limit(1).count() > 0
        if (!hasChildren && exists) deleteStudy(spark, result, Some(tn), None)
        else result
      case None => result
    }
  }
}

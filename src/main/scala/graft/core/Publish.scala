package graft.core

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Crash-safe multi-table warehouse publish: staging, the batch manifest,
  * idempotent commit/roll-forward recovery, and the partitioned-table
  * registry. Extracted from [[graft.GraftCli]] (same behavior, same
  * specs — GraftCliManifestSpec's kill-point sweep runs against this
  * object): each table swap is atomic, and the manifest written before
  * the first swap of a batch lets a restart complete an interrupted
  * multi-table publish instead of leaving a mixed old/new star (the
  * reference gets batch atomicity from a DB transaction,
  * AbstractDataProcessor.groovy:58-75). */
object Publish {
  /** Partition column per big table; tables not listed here are
    * node/metadata-sized and whole-replaced. `patient_dimension`'s
    * `trial` column is DERIVED at write time from the usubjid-shaped
    * sourcesystem_cd (`TRIAL:SITE:SUBJ` — first ':'-component). */
  val PartitionedTables: Map[String, String] = Map(
    "observation_fact" -> "sourcesystem_cd",
    "patient_dimension" -> "trial",
    "patient_trial" -> "trial",
    "de_subject_sample_mapping" -> "trial_name",
    "de_subject_acgh_data" -> "trial_name",
    "de_subject_microarray_data" -> "trial_name",
    "de_subject_protein_data" -> "trial_name",
    "de_subject_rbm_data" -> "trial_name",
    "de_subject_mirna_data" -> "trial_name",
    "de_subject_metabolomics_data" -> "trial_name",
    "de_subject_rna_data" -> "trial_name",
    "de_sample_snp_data" -> "trial_name",
    "plink_data" -> "trial_name",
    "de_variant_subject_idx" -> "dataset_id",
    "de_variant_population_info" -> "dataset_id",
    "de_variant_subject_detail" -> "dataset_id",
    "de_variant_subject_summary" -> "dataset_id",
    "de_variant_population_data" -> "dataset_id",
    "probeset_deapp" -> "platform",
    "de_mrna_annotation" -> "gpl_id",
    "de_chromosomal_region" -> "gpl_id")

  /** Publish a staged artifact tree over `target` without a
    * lost-artifact window. The naive delete-target-then-rename leaves
    * NOTHING if the process dies between the two ops; here the live
    * tree is PARKED under `<target>.old` (a rename, not a delete), the
    * staged tree renames in, and only then is the parked tree removed —
    * a crash at any point leaves either the old artifact live or the
    * old artifact parked, and [[healArtifact]] (writer-side) or
    * [[awaitArtifact]] (loader-side, after its retries) rolls the
    * parked copy back.
    *
    * Guarded against a concurrent heal racing the two renames: if
    * `target` reappears after the park (a healer restored the parked
    * copy in the window), the publish rename on HDFS would NEST `tmp`
    * INSIDE the restored directory (rename-into-existing-dir
    * semantics) — silent corruption. The target-absence check fails
    * loudly instead, and a post-rename nesting check un-nests and
    * fails if the race lands between check and rename. Callers are
    * writers and must hold the artifact's write lock where one exists
    * (the curate/warehouse cycles do); standalone fits rely on these
    * guards. */
  /** Test hook: runs between the park and the publish rename, so specs
    * can simulate a concurrent heal landing in the swap window. */
  private[graft] var testAfterPark: Option[() => Unit] = None

  private[graft] def swapArtifact(fs: org.apache.hadoop.fs.FileSystem,
                                  tmp: org.apache.hadoop.fs.Path,
                                  target: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(target.toString + ".old")
    fs.delete(old, true)
    if (fs.exists(target))
      require(fs.rename(target, old), s"could not park $target aside")
    testAfterPark.foreach(_.apply())
    if (fs.exists(target))
      // the park just vacated this path; its reappearance means another
      // process healed or published concurrently — renaming now would
      // nest tmp inside it. Staged tree and parked copy both survive.
      throw new IllegalStateException(
        s"$target reappeared mid-swap (concurrent heal or publish?) — " +
          s"staged tree left at $tmp, parked copy at $old")
    if (!fs.rename(tmp, target)) {
      if (fs.exists(old)) fs.rename(old, target) // restore before failing
      throw new IllegalStateException(s"could not publish $tmp to $target")
    }
    // rename-into-existing-dir detection: a heal that landed between the
    // absence check and the rename turns the publish into target/<tmp>.
    // No legitimate artifact tree contains a child named like a staging
    // dir, so presence is proof — un-nest the staged tree and fail.
    val nested = new org.apache.hadoop.fs.Path(target, tmp.getName)
    if (fs.exists(nested)) {
      fs.rename(nested, tmp)
      throw new IllegalStateException(
        s"publish of $tmp raced a concurrent heal of $target and nested — " +
          s"staged tree restored to $tmp, live tree is the healed copy")
    }
    fs.delete(old, true)
  }

  /** Roll back a [[swapArtifact]] interrupted between its two renames:
    * target missing + parked copy present -> restore the parked copy.
    * A present target means the swap completed (or never ran) — the
    * parked leftover, if any, is stale and removed. Idempotent.
    *
    * WRITER-SIDE ONLY: callers must hold the artifact's write lock (or
    * be the sole writer by deployment contract). A loader running this
    * concurrently with an in-flight [[swapArtifact]] could restore the
    * freshly PARKED copy over the target mid-swap, or delete the parked
    * copy the swap still needs — loaders use [[awaitArtifact]], which
    * never mutates a live artifact. */
  private[graft] def healArtifact(fs: org.apache.hadoop.fs.FileSystem,
                                  target: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(target.toString + ".old")
    if (!fs.exists(target)) { if (fs.exists(old)) fs.rename(old, target) }
    else fs.delete(old, true)
  }

  /** Loader-side readiness wait. A missing `target` is almost always a
    * reader landing in [[swapArtifact]]'s one-metadata-op window between
    * its two renames — retrying a few times outlasts any live swap. Only
    * after the retries are exhausted AND a parked copy exists (the
    * writer died mid-swap and nothing restarted it) does the loader
    * restore the parked copy — recovery of last resort, reached ~never
    * while a writer is actually mid-flight. A PRESENT target returns
    * immediately and never touches `<target>.old`: a stale parked copy
    * next to a live artifact is the WRITER's to clean (deleting it here
    * is exactly the race that could strand an in-flight swap). */
  private[graft] def awaitArtifact(fs: org.apache.hadoop.fs.FileSystem,
                                   target: org.apache.hadoop.fs.Path,
                                   attempts: Int = 10,
                                   delayMs: Long = 50L): Unit = {
    var i = 0
    while (!fs.exists(target) && i < attempts) { Thread.sleep(delayMs); i += 1 }
    if (!fs.exists(target)) {
      val old = new org.apache.hadoop.fs.Path(target.toString + ".old")
      if (fs.exists(old)) fs.rename(old, target)
    }
  }

  // Hive-compatible partition-dir escaping (the char set Spark's writer
  // escapes), so partition values like `GSE0:VCFTEST` round-trip between
  // our dir bookkeeping and Spark's own `<col>=<value>` layout.
  private[graft] val EscapedChars: Set[Char] =
    (0.toChar to 31.toChar).toSet ++
      Set('"', '#', '%', '\'', '*', '/', ':', '=', '?', '\\', '\u007F',
        '{', '[', ']', '^')

  private[graft] def escapePartVal(v: String): String =
    if (v == null || v.isEmpty) "__HIVE_DEFAULT_PARTITION__"
    else v.flatMap(c =>
      if (EscapedChars(c)) f"%%${c.toInt}%02X" else c.toString)

  private[graft] def unescapePartVal(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          s.substring(i + 1, i + 3).forall(h => Character.digit(h, 16) >= 0)) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Files.list with the directory stream closed (a leaked stream holds a
    * directory fd until GC — one per table per study over a long crawl). */
  private[graft] def listDir(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq
      } finally s.close()
    }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  /** Existing partition values of a partitioned table — one directory
    * listing, never a data scan. */
  def listPartitionValues(wh: Path, name: String): Seq[String] = {
    val pc = PartitionedTables(name)
    listDir(wh.resolve(s"$name.parquet"))
      .map(_.getFileName.toString)
      .filter(_.startsWith(pc + "="))
      .map(d => unescapePartVal(d.substring(pc.length + 1)))
      .filter(v => v != "__HIVE_DEFAULT_PARTITION__" && v != "__EMPTY__")
  }

  private[graft] final case class StagedWrite(name: String,
      partValues: Option[Seq[String]],
      partitioned: Boolean,
      fileSchema: StructType)

  /** Stage a whole-table replacement to `<name>.parquet.tmp`. */
  private[graft] def stageWhole(df: DataFrame, wh: Path, name: String): StagedWrite = {
    Files.createDirectories(wh)
    df.write.mode("overwrite").parquet(wh.resolve(s"$name.parquet.tmp").toString)
    StagedWrite(name, None, partitioned = false, df.schema)
  }

  private[graft] def withPartCol(df: DataFrame, name: String): DataFrame = {
    val pc = PartitionedTables(name)
    if (name == "patient_dimension")
      // derive (or re-derive) the trial from the usubjid; rows read back
      // from the table already carry it — coalesce keeps theirs
      df.withColumn(pc,
        if (df.columns.contains(pc))
          coalesce(col(pc), substring_index(col("sourcesystem_cd"), ":", 1))
        else substring_index(col("sourcesystem_cd"), ":", 1))
    else df
  }

  /** In-file sort key per table: partitions are laid out sorted by their
    * hot filter column, so parquet row-group min/max stats prune concept-
    * keyed reads (the reference's per-partition work-table indexes,
    * I2B2_PROCESS_MRNA_DATA.sql:277-279, as a lakehouse layout property).
    * A local sort only — the partition filter already bounded the data. */
  private[graft] val PartitionSortKeys: Map[String, String] = Map(
    "observation_fact" -> "concept_cd",
    "de_subject_acgh_data" -> "region_id",
    "de_subject_microarray_data" -> "probeset_id",
    "de_subject_protein_data" -> "probeset_id",
    "de_subject_rbm_data" -> "probeset_id",
    "de_subject_mirna_data" -> "probeset_id",
    "de_subject_metabolomics_data" -> "probeset_id",
    "de_subject_rna_data" -> "probeset_id",
    "de_sample_snp_data" -> "snp_name",
    "de_variant_subject_summary" -> "rs_id",
    "de_variant_subject_detail" -> "rs_id")

  /** Stage a replacement of ONLY the named partitions: rows outside them
    * are dropped (the read side prunes to the affected partitions), and a
    * value with no surviving rows becomes a partition DROP at commit. */
  private[graft] def stagePart(df0: DataFrame, wh: Path, name: String,
                        values: Seq[String]): StagedWrite = {
    val pc = PartitionedTables(name)
    val df = withPartCol(df0, name)
    Files.createDirectories(wh)
    val vs = values.distinct
    val filtered =
      if (vs.isEmpty) df.filter(lit(false)) else df.filter(col(pc).isInCollection(vs))
    val laidOut = PartitionSortKeys.get(name)
      .filter(df.columns.contains)
      // sort key PREFIXED by the partition col so the writer's required
      // partition ordering is already satisfied and the secondary order
      // survives into the files
      .map(k => filtered.sortWithinPartitions(col(pc), col(k)))
      .getOrElse(filtered)
    laidOut.write.mode("overwrite").partitionBy(pc)
      .parquet(wh.resolve(s"$name.parquet.tmp").toString)
    StagedWrite(name, Some(vs), partitioned = true,
      StructType(df.schema.filterNot(_.name == pc)))
  }

  /** Stage a FULL rewrite of a partitioned table (library fallback — the
    * per-study paths always know their affected partition values). */
  private[graft] def stagePartAll(df0: DataFrame, wh: Path, name: String): StagedWrite = {
    val pc = PartitionedTables(name)
    val df = withPartCol(df0, name)
    Files.createDirectories(wh)
    df.write.mode("overwrite").partitionBy(pc)
      .parquet(wh.resolve(s"$name.parquet.tmp").toString)
    StagedWrite(name, None, partitioned = true,
      StructType(df.schema.filterNot(_.name == pc)))
  }

  // ---- crash-safe multi-table publish: the batch manifest -------------
  // Each table swap is atomic, but a batch (writeStar) swaps MANY tables;
  // a kill between two swaps used to leave a mixed old/new star with
  // nothing to finish the job (the reference gets batch atomicity from a
  // DB transaction, AbstractDataProcessor.groovy:58-75). The manifest is
  // written after ALL staging completes and removed after the LAST swap,
  // so a manifest found on startup proves every table's new content still
  // exists (already committed, or intact in its .tmp) — recovery simply
  // ROLLS FORWARD by re-running the remaining swaps. Per-table recovery is
  // idempotent; the one ambiguous shape — "partition dir present with no
  // staged data": committed swap, or a pending DROP? — is resolved by
  // recording data vs drop values separately at staging time.

  private[graft] val ManifestName = "_publish.manifest"

  private[graft] def encField(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private[graft] def decField(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  private[graft] def writeManifest(wh: Path, writes: Seq[StagedWrite]): Unit = {
    val lines = writes.map { w =>
      val kind = w.partValues match {
        case Some(_) => "part"
        case None    => if (w.partitioned) "partAll" else "whole"
      }
      // which affected values actually staged data: absent ones are DROPs
      val (dataVals, dropVals) = w.partValues.map { vs =>
        val pc = PartitionedTables(w.name)
        val tmp = wh.resolve(s"${w.name}.parquet.tmp")
        vs.partition(v => Files.exists(tmp.resolve(s"$pc=${escapePartVal(v)}")))
      }.getOrElse((Seq.empty, Seq.empty))
      Seq(w.name, kind,
        dataVals.map(encField).mkString(","),
        dropVals.map(encField).mkString(","),
        encField(w.fileSchema.json)).mkString("\t")
    }
    val tmp = wh.resolve(ManifestName + ".tmp")
    Files.write(tmp,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, wh.resolve(ManifestName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Test hook: throw after N table commits to simulate a mid-batch kill. */
  private[graft] var testFailAfterCommits: Option[Int] = None

  /** Promote staged writes. All staging (which is what reads the OLD
    * files) must be complete before the first commit of a batch. */
  private[graft] def commitStaged(spark: SparkSession, wh: Path,
                           writes: Seq[StagedWrite]): Unit = {
    writeManifest(wh, writes)
    writes.zipWithIndex.foreach { case (w, i) =>
      commitOne(spark, wh, w, dropValues = Seq.empty, recovery = false)
      if (testFailAfterCommits.exists(_ == i + 1))
        throw new IllegalStateException(s"test kill after ${i + 1} commits")
    }
    Files.deleteIfExists(wh.resolve(ManifestName))
  }

  /** One table's swap — idempotent, so batch recovery can re-run it.
    *
    * Partition-drop semantics differ by mode: on FIRST commit a value with
    * no staged dir is always a drop (staging just produced the tmp), but
    * on RECOVERY a missing staged dir can also mean "this value's swap
    * already committed before the kill" — only the manifest's recorded
    * `dropValues` may delete then. */
  private[graft] def commitOne(spark: SparkSession, wh: Path, w: StagedWrite,
                        dropValues: Seq[String], recovery: Boolean): Unit = {
    val tmp = wh.resolve(s"${w.name}.parquet.tmp")
    val dst = wh.resolve(s"${w.name}.parquet")
    w.partValues match {
      case None =>
        val old = wh.resolve(s"${w.name}.parquet.old")
        if (Files.exists(tmp)) {
          deleteRecursively(old) // stale leftover from a crash
          if (Files.exists(dst)) Files.move(dst, old)
          Files.move(tmp, dst)
        }
        // also finishes a kill that landed between the two moves above
        deleteRecursively(old)
      case Some(vs) =>
        val pc = PartitionedTables(w.name)
        Files.createDirectories(dst)
        val batchUnfinished = Files.exists(tmp)
        val drops = dropValues.toSet
        vs.foreach { v =>
          val dirName = s"$pc=${escapePartVal(v)}"
          val from = tmp.resolve(dirName)
          val to = dst.resolve(dirName)
          val old = dst.resolve("_old_" + dirName)
          if (Files.exists(from)) {
            if (Files.exists(to)) {
              // an `old` that coexists with `to` is stale (a finished or
              // unrelated crash left it); the mid-swap shape is old
              // WITHOUT to, handled by falling straight to the move below
              deleteRecursively(old)
              Files.move(to, old)
            }
            Files.move(from, to)
          } else if (batchUnfinished && (if (recovery) drops.contains(v) else true)) {
            // partition DROP: the value staged no rows
            deleteRecursively(to)
          }
          deleteRecursively(old)
        }
        deleteRecursively(tmp)
        // stale _old_ leftovers from kills outside this batch's value set
        listDir(dst).filter(_.getFileName.toString.startsWith("_old_"))
          .foreach(deleteRecursively)
    }
    if (w.partitioned) ensureReadable(spark, wh, w.name, w.fileSchema)
  }

  /** Complete an interrupted publish batch (idempotent roll-forward).
    * Returns true when a manifest was found and recovered. Runs under the
    * CLI process lock before any command touches the warehouse. */
  private[graft] def recoverPublish(spark: SparkSession, wh: Path): Boolean = {
    val mf = wh.resolve(ManifestName)
    // a kill DURING manifest staging leaves only the tmp: no commit ran
    // yet (the manifest lands before the first swap), so the star is the
    // old one and the tmp is just litter
    Files.deleteIfExists(wh.resolve(ManifestName + ".tmp"))
    if (!Files.exists(mf)) return false
    println(s"!!! unfinished publish found in $wh — completing the swap")
    val lines = new String(Files.readAllBytes(mf),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    lines.foreach { ln =>
      val f = ln.split("\t", -1)
      val (name, kind) = (f(0), f(1))
      def vals(s: String) =
        if (s.isEmpty) Seq.empty[String] else s.split(",", -1).toSeq.map(decField)
      val (dataVals, dropVals) = (vals(f(2)), vals(f(3)))
      val schema = org.apache.spark.sql.types.DataType.fromJson(decField(f(4)))
        .asInstanceOf[StructType]
      val w = StagedWrite(name,
        if (kind == "part") Some(dataVals ++ dropVals) else None,
        partitioned = kind != "whole", schema)
      commitOne(spark, wh, w, dropValues = dropVals, recovery = true)
    }
    Files.deleteIfExists(mf)
    true
  }

  /** A partitioned table whose LAST partition was dropped (or that was
    * created empty) must stay readable by a plain parquet scan: leave a
    * zero-row schema marker partition. Removed again once real data
    * partitions exist. */
  private[graft] def ensureReadable(spark: SparkSession, wh: Path, name: String,
                             fileSchema: StructType): Unit = {
    val pc = PartitionedTables(name)
    val dst = wh.resolve(s"$name.parquet")
    val marker = dst.resolve(s"$pc=__EMPTY__")
    val hasData = listDir(dst).exists { d =>
      val n = d.getFileName.toString
      n.startsWith(pc + "=") && n != s"$pc=__EMPTY__" &&
        listDir(d).exists(_.getFileName.toString.endsWith(".parquet"))
    }
    if (!hasData)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), fileSchema)
        .write.mode("overwrite").parquet(marker.toString)
    else if (Files.exists(marker)) deleteRecursively(marker)
  }
}

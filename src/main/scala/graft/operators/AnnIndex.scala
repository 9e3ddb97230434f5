package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the artifact discipline (dedup ledger,
  * boilerplate dictionary, BPE merge table) applied to similarity
  * search: build the index ONCE batch-side, search it many times
  * without ever re-deriving assignments.
  *
  * Layout under one path:
  *  - `centroids/` — (centroid_id, c_vec), KB-sized by contract
  *  - `postings/`  — the collection with its list assignment,
  *    HIVE-PARTITIONED BY `list_id`: a search with nprobe lists loads
  *    ONLY those lists' directories (explicit probed-path selection
  *    with `basePath`, so the unprobed partitions are never even
  *    LISTED, independent of partition-value type inference) — at
  *    100 TB the unprobed 1 - nprobe/numLists of the collection is
  *    never opened, the pruning a memory-resident IVF gets from its
  *    inverted lists, re-expressed as parquet partition layout.
  *  - `_params`   — numLists recorded at build, re-validated at open
  *    (an index is only valid for the quantizer it was built with).
  *
  * The build stages under `<path>.tmp`, parks any live index under
  * `<path>.old` and swaps ([[graft.core.Publish.swapArtifact]]): a
  * searcher never opens a half-written index, a crash mid-publish
  * never LOSES the previous index (writers heal the parked copy back;
  * readers retry through the one-metadata-op missing-path window and
  * only restore the parked copy as a last resort — see
  * [[graft.core.Publish.awaitArtifact]]). */
object AnnIndex {

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_params")

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  /** `asWriter = true` (append/delete — index mutators) heals a publish
    * that died between its two renames; readers only RETRY through the
    * window ([[graft.core.Publish.awaitArtifact]]) — a reader-side heal
    * could race an in-flight swap and corrupt the publish. */
  private def readMarker(path: String, asWriter: Boolean = false): String = {
    val fs = fsOf(path)
    val target = new org.apache.hadoop.fs.Path(path)
    if (asWriter) graft.core.Publish.healArtifact(fs, target)
    else graft.core.Publish.awaitArtifact(fs, target)
    val in = fs.open(markerPath(path))
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
    finally in.close()
  }

  private def paramsLine(numLists: Int) = s"numLists=$numLists"

  /** Takedown-discovery sidecar (the [[DedupLedger]] `dirs/` pattern):
    * `ids/` maps each vector id to its list_id, partitioned by
    * `idb=pmod(xxhash64(id), 64)` — a delete reads only the id-hash
    * partitions its ids fall in instead of scanning the full postings
    * table for discovery. Indexes built before the sidecar existed fall
    * back to the full scan. */
  private val SidecarBuckets = 64L

  private def idb(id: org.apache.spark.sql.Column) =
    pmod(xxhash64(id), lit(SidecarBuckets)).cast("int")

  private def hasSidecar(path: String): Boolean =
    fsOf(path).exists(new org.apache.hadoop.fs.Path(path, "ids"))

  /** Build and publish the index. Assignment is the same codegen'd
    * literal-centroid argmax every IVF tier uses (no join, no shuffle
    * for assignment); the one exchange is the partitioned write's
    * list_id grouping. Centroids default to [[Similarity.seedCentroids]];
    * pass a [[Similarity.kmeansCentroids]] table for a trained coarse
    * quantizer. */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
            numLists: Int, path: String,
            centroids: Option[DataFrame] = None): Unit = {
    val spark = vectors.sparkSession
    val cents = centroids.getOrElse(
      Similarity.seedCentroids(vectors, idCol, vecCol, numLists))
    val collected = Similarity.collectCentroids(cents)
    require(collected.size == numLists,
      s"centroid table has ${collected.size} rows, expected $numLists")
    val fs = fsOf(path)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    fs.delete(tmp, true)
    cents.write.parquet(s"${tmp.toString}/centroids")
    vectors
      .select(col(idCol), col(vecCol),
        Similarity.nearestCentroid(col(vecCol), collected).as("list_id"))
      .write.partitionBy("list_id").parquet(s"${tmp.toString}/postings")
    // takedown-discovery sidecar, derived from the STAGED postings (a
    // column-pruned id + partition-value scan — the argmax is not
    // recomputed); publishes atomically with the data it describes
    spark.read.parquet(s"${tmp.toString}/postings")
      .select(col(idCol), col("list_id").cast("long").as("list_id"))
      .withColumn("idb", idb(col(idCol)))
      .hint("rebalance", "idb")
      .write.partitionBy("idb").parquet(s"${tmp.toString}/ids")
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_params"), true)
    try out.write((paramsLine(numLists) + "\n").getBytes("UTF-8"))
    finally out.close()
    // park-and-swap: the previous index survives a crash mid-publish
    // (see Publish.swapArtifact / awaitArtifact for the recovery split)
    graft.core.Publish.swapArtifact(fs, tmp, target)
  }

  /** Append new vectors to an existing index — the daily-ingest shape:
    * assignment uses the index's OWN persisted centroids (the quantizer
    * never drifts under appends; retrain = rebuild), new postings land
    * as additional files inside their lists' partitions. A crash mid-
    * append leaves complete parquet files of a partial batch — re-run
    * idempotency is the CALLER's discipline (same-id rows would
    * duplicate), matching the curate cycle's anti-join-before-append
    * convention. */
  def append(vectors: DataFrame, idCol: String, vecCol: String,
             path: String): Unit = {
    val spark = vectors.sparkSession
    val marker = readMarker(path, asWriter = true)
    // roll an interrupted delete forward BEFORE appending: files added
    // into a list partition a pending swap has staged a replacement for
    // would be silently discarded when the swap rolls forward (search
    // refuses a pending swap; delete recovers; append must too)
    recoverDelete(spark, path)
    val collected = Similarity.collectCentroids(
      spark.read.parquet(s"$path/centroids"))
    require(marker == paramsLine(collected.size),
      s"index at $path recorded '$marker' but its centroid table has " +
        s"${collected.size} rows — rebuild the index")
    // localCheckpoint: the assignment argmax runs once and feeds both
    // the sidecar and the postings append. Sidecar FIRST — a crash
    // between the two leaves an over-inclusive sidecar row (a delete
    // then rewrites a list the id is not in — harmless); the reverse
    // order would leave postings a takedown cannot find.
    val assigned = vectors
      .select(col(idCol), col(vecCol),
        Similarity.nearestCentroid(col(vecCol), collected).as("list_id"))
      .localCheckpoint()
    if (hasSidecar(path))
      // cast matches build's sidecar schema (the assignment argmax is
      // int-typed; the build sidecar derives BIGINT from the partition
      // value) — mixed types would break schema merge on read
      assigned.select(col(idCol), col("list_id").cast("long").as("list_id"))
        .withColumn("idb", idb(col(idCol)))
        .hint("rebalance", "idb")
        .write.mode("append").partitionBy("idb").parquet(s"$path/ids")
    assigned
      .write.mode("append").partitionBy("list_id")
      .parquet(s"$path/postings")
  }

  /** Remove vectors by id — the corpus-ops path for takedowns and
    * dedup-driven removals, rewriting ONLY the affected list partitions
    * (everything the deleted ids never touched is never read for the
    * rewrite and never rewritten).
    *
    * Shape: one narrow column-pruned pass over postings (id, list_id)
    * semi-joined to `ids` finds the affected lists (bounded ≤ numLists
    * collect); those partitions re-read with an anti-join and staged.
    * The commit is [[graft.core.PartitionSwap]] — the shared
    * swap-vs-drop marker discipline the ledger deletes use (a list
    * whose every row is deleted stages no dir and must DROP, recorded
    * up front so recovery is never ambiguous about a missing staged
    * dir); [[recoverDelete]] rolls an interrupted commit FORWARD.
    * Returns the affected list ids. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             idCol: String): Seq[Long] = {
    val marker = readMarker(path, asWriter = true)
    recoverDelete(spark, path)
    val fs = fsOf(path)
    val root = new org.apache.hadoop.fs.Path(path)
    val collected = Similarity.collectCentroids(
      spark.read.parquet(s"$path/centroids"))
    require(marker == paramsLine(collected.size),
      s"index at $path recorded '$marker' but its centroid table has " +
        s"${collected.size} rows — rebuild the index")
    val idSet = ids.select(col(idCol)).distinct()
      .localCheckpoint() // discovery + both staging joins
    // O(batch) discovery through the `ids/` sidecar when present: only
    // the id-hash partitions the deleted ids fall in are read, never
    // the full postings table. Pre-sidecar indexes full-scan as before.
    val (affected, dirRels) =
      if (hasSidecar(path)) {
        val idbs = idSet.select(idb(col(idCol)).as("b"))
          .distinct().collect().map(_.getInt(0)).sorted
        val dRels = idbs.map(b => s"ids/idb=$b")
          .filter(r => fs.exists(new org.apache.hadoop.fs.Path(root, r)))
          .toSeq
        if (dRels.isEmpty) (Seq.empty[Long], Seq.empty[String])
        else {
          val hits = spark.read.option("basePath", s"$path/ids")
            .parquet(dRels.map(r => s"$path/$r"): _*)
            .join(idSet, Seq(idCol), "left_semi")
            .select(col("list_id").cast("long")).distinct()
            .collect().map(_.getLong(0)).sorted.toSeq // <= numLists
          if (hits.isEmpty) (hits, Seq.empty[String])
          // an over-inclusive sidecar row (crashed append) may name a
          // list whose dir was never written — skip it
          else (hits.filter(l => fs.exists(new org.apache.hadoop.fs.Path(
            root, s"postings/list_id=$l"))), dRels)
        }
      } else {
        val hits = spark.read.parquet(s"$path/postings")
          .join(idSet, Seq(idCol), "left_semi")
          .select(col("list_id").cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq // bounded: <= numLists
        (hits, Seq.empty[String])
      }
    val rels = affected.map(l => s"postings/list_id=$l") ++ dirRels
    if (rels.isEmpty) return affected
    fs.delete(graft.core.PartitionSwap.tmpRoot(root), true)
    if (affected.nonEmpty)
      spark.read.option("basePath", s"$path/postings")
        .parquet(affected.map(l => s"$path/postings/list_id=$l"): _*)
        .join(idSet, Seq(idCol), "left_anti")
        .write.partitionBy("list_id")
        .parquet(new org.apache.hadoop.fs.Path(
          graft.core.PartitionSwap.tmpRoot(root), "postings").toString)
    // the sidecar rows for the deleted ids go in the SAME commit
    if (dirRels.nonEmpty)
      spark.read.option("basePath", s"$path/ids")
        .parquet(dirRels.map(r => s"$path/$r"): _*)
        .join(idSet, Seq(idCol), "left_anti")
        .write.partitionBy("idb")
        .parquet(new org.apache.hadoop.fs.Path(
          graft.core.PartitionSwap.tmpRoot(root), "ids").toString)
    graft.core.PartitionSwap.commit(fs, root, rels)
    affected
  }

  /** Finish (roll forward) an interrupted [[delete]]. Idempotent and
    * cheap on a clean index; [[delete]] runs it first. Returns true if
    * an unfinished delete was completed. */
  def recoverDelete(spark: SparkSession, path: String): Boolean =
    graft.core.PartitionSwap.recover(fsOf(path),
      new org.apache.hadoop.fs.Path(path))


  /** Search the persisted index: the probe side mirrors the in-memory
    * IVF tier (literal-centroid scores, sorted-slice probe pick, final
    * rank through the k-capped aggregate — zero Window operators); the
    * collection side reads ONLY the probed postings directories (the
    * scan's file index holds exactly those paths). The probed-list id
    * set is the one bounded driver round-trip: ≤ numLists ints, never
    * data-sized. */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val marker = readMarker(path)
    // a crashed mid-commit delete leaves the swap marker: some lists
    // swapped, some parked — a search now would be silently WRONG
    // (missing vectors), so fail loudly; recovery is the writer's
    // (recoverDelete, under whatever lock guards index mutation)
    require(!graft.core.PartitionSwap.pending(fsOf(path),
        new org.apache.hadoop.fs.Path(path)),
      s"index at $path has an unfinished delete — run AnnIndex.recoverDelete")
    val cents = Similarity.collectCentroids(
      spark.read.parquet(s"$path/centroids"))
    require(marker == paramsLine(cents.size),
      s"index at $path recorded '$marker' but its centroid table has " +
        s"${cents.size} rows — rebuild the index")
    val vnorm = Similarity.l2Norm(col(vecCol))
    val probeScores = cents.zipWithIndex.map { case (cv, cid) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(
        round(Similarity.dot(col(vecCol), array(cv.map(lit): _*)) / (vnorm * cn), 6)
          .as("cos"),
        lit(-cid.toLong).as("negid"))
    }
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        vnorm.as("q_norm"),
        explode(slice(sort_array(array(probeScores: _*), asc = false),
          1, nprobe)).as("__probe"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        (-col("__probe.negid")).as("list_id"))
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getLong(0)).sorted // bounded: <= numLists ints
    // explicit directory selection: ONLY the probed lists' partitions are
    // even listed, independent of partition-value type inference (an
    // empty list writes no directory — skip it; basePath keeps list_id)
    val fs = fsOf(path)
    val probedPaths = probedLists
      .map(l => s"$path/postings/list_id=$l")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (probedPaths.isEmpty)
      return probes
        .select(col("q_id"), col("q_id").as("neighbor_id"),
          lit(0.0).as("cosine"), lit(1L).as("rank"))
        .limit(0)
    val postings = spark.read.option("basePath", s"$path/postings")
      .parquet(probedPaths: _*)
      .select(col("list_id").cast("long").as("list_id"),
        col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        Similarity.l2Norm(col(vecCol)).as("n_norm"))
    val pairs = broadcast(probes).join(postings, Seq("list_id"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(Similarity.dot(col("q_vec"), col("n_vec"))
          / (col("q_norm") * col("n_norm")), 6))
    Sampling.topKPerGroup(pairs, Seq("q_id"), "cosine", "neighbor_id", k,
        descending = true, numericIdOrder = true)
      .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}

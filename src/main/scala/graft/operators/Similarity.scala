package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * - Brute-force cosine top-k: the correctness baseline. Queries are tiny
  *   and broadcast; candidates stream — one pass over the big side, no
  *   shuffle of the vectors themselves.
  * - Random-hyperplane LSH bucketing: the scale path. Buckets come from
  *   deterministic md5-derived hyperplanes, so candidate generation is an
  *   equi-join on the bucket key; at 100 TB only same-bucket vectors are
  *   compared (multi-probe = repeat with several plane sets).
  *
  * All math in double precision via sequential folds (aggregate over
  * zip_with) — deterministic, engine-portable, codegen-friendly; no UDF.
  */
object Similarity {

  /** Double-precision dot product, ascending-index accumulation. Native
    * codegen'd Expression (VectorExpressions.DotProduct) — the pair-stage
    * hot loop stays inside WholeStageCodegen; bit-identical to the
    * interpreted fold [[dotFold]] it replaces. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotNative(a, b)

  def l2Norm(a: Column): Column =
    graft.functions.VectorExpressions.l2NormNative(a)

  /** Reference implementation via higher-order fold (interpreted); kept
    * for cross-checking the native expression in tests. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2NormFold(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k. `queries`/`vectors` both carry (idCol,
    * vecCol); ranks are assigned on the ROUNDED cosine with id tiebreak so
    * results are reproducible across engines and runs. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms precomputed per side: higher-order folds are interpreted (not
    // whole-stage-codegen'd), so do 1 fold per pair instead of 3
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm")))
    val c = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_norm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, col("q_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic +/-1 hyperplanes: sign(j, d) = +1 iff the first hex
    * nibble of md5("j_d") < 8. Reproducible in any engine with md5. */
  def hyperplaneSigns(numPlanes: Int, dim: Int): IndexedSeq[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { j =>
      Array.tabulate(dim) { d =>
        val h = digest.digest(s"${j}_$d".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xF) < 8) 1.0 else -1.0
      }
    }
  }

  /** LSH bucket id: bit j set iff dot(vec, plane_j) > 0. */
  def lshBucket(vecCol: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vecCol, planeCol) > 0, shiftleft(lit(1), j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucketed ANN: top-k within the query's bucket only (scale path —
    * recall depends on bucket granularity; callers widen with multi-probe). */
  def lshTopK(vectors: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplaneSigns(numPlanes, dim)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), planes).as("bucket")))
    val c = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
    * every vector is assigned once to its nearest of `numLists` centroids
    * (building inverted lists keyed by `list_id`), and a query scans only
    * its `nprobe` nearest lists instead of the whole collection.
    *
    * Centroids are seeded deterministically (the `numLists` lowest-id
    * vectors) rather than k-means-iterated: Lloyd iterations accumulate
    * float sums in partition order, which no independent oracle can
    * reproduce — and the structure that matters for the plan (assign /
    * probe / rank-within-lists) is identical. At scale you would refine
    * the seeds offline and feed them in.
    *
    * 100 TB shape: centroids broadcast (numLists is thousands at most);
    * assignment is one narrow pass with a partial-aggregable argmax (no
    * pair shuffle, no window); the candidate join touches nprobe/numLists
    * of the data per query. Cosines are rounded to 6 dp BEFORE every
    * argmax/rank so tiebreaks are reproducible across engines. */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                numLists: Int): DataFrame = {
    val cents = broadcast(vectors
      .orderBy(col(idCol)).limit(numLists)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("c_vec"),
        l2Norm(col(vecCol)).as("c_norm")))
    vectors
      .select(col(idCol), col(vecCol), l2Norm(col(vecCol)).as("__norm"))
      .join(cents)
      .withColumn("c_cos",
        round(dot(col(vecCol), col("c_vec")) / (col("__norm") * col("c_norm")), 6))
      // argmax as a map-side-combinable agg: max over (cosine, -centroid)
      // keeps the smallest centroid id on ties, like ORDER BY cos DESC, id
      .groupBy(col(idCol))
      .agg(max(struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
        first(col(vecCol)).as(vecCol), first(col("__norm")).as("__norm"))
      .select(col(idCol), col(vecCol), col("__norm"),
        (-col("best.neg_id")).as("list_id"))
  }

  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numLists: Int, nprobe: Int): DataFrame = {
    val cents = broadcast(vectors
      .orderBy(col(idCol)).limit(numLists)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("c_vec"),
        l2Norm(col(vecCol)).as("c_norm")))
    // queries pick their nprobe nearest lists (tiny frame; window is fine)
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    val probes = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_norm"))
      .join(cents)
      .withColumn("c_cos",
        round(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        col("centroid_id").as("list_id")))
    val assigned = ivfAssign(vectors, idCol, vecCol, numLists)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        col("__norm").as("n_norm"), col("list_id"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(assigned, Seq("list_id"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding near-dup: same-block pairs above a cosine threshold.
    * Blocking key bounds the pair blow-up (label here; LSH bucket at scale). */
  def embeddingNearDup(vectors: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double): DataFrame = {
    val a = vectors.select(col(blockCol).as("block"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"), l2Norm(col(vecCol)).as("a_norm"))
    val b = vectors.select(col(blockCol).as("block"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"), l2Norm(col(vecCol)).as("b_norm"))
    a.join(b, Seq("block"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine_raw",
        dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm")))
      .filter(col("cosine_raw") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine_raw"), 6).as("cosine"))
  }
}

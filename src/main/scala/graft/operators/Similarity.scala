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
  * All math is double precision in ascending-index accumulation order —
  * deterministic and engine-portable. The hot paths (dot product, PQ
  * encode, ADC lookup-sum) are native codegen'd Catalyst expressions
  * ([[graft.functions.VectorExpressions]]); the equivalent interpreted
  * higher-order folds are kept as cross-check references for the specs.
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

  /** Per-query top-k over a scored pair frame (q_id, neighbor_id,
    * scoreCol, ...) via the k-capped [[Sampling.topKPerGroup]] aggregate —
    * NOT a row_number window. A window's PARTITION BY q_id puts every
    * candidate for one query into ONE unsplittable sorted task, so a hot
    * query over a 100x collection is a guaranteed straggler; the
    * aggregate keeps at most k (score, id) pairs per partial buffer,
    * merges map-side, and splits the candidate scan across however many
    * tasks the scan has. Result contract is bit-identical to
    * row_number() OVER (PARTITION BY q_id ORDER BY score [DESC|ASC],
    * neighbor_id) — numeric id tiebreak, matching every ANN oracle. */
  private def rankTopK(pairs: DataFrame, scoreCol: String, k: Int,
                       ascending: Boolean = false): DataFrame =
    Sampling.topKPerGroup(pairs, Seq("q_id"), scoreCol, "neighbor_id", k,
        descending = !ascending, numericIdOrder = true)
      .select(col("q_id"), col("neighbor_id"), col(scoreCol), col("rank"))

  /** Brute-force cosine top-k. `queries`/`vectors` both carry (idCol,
    * vecCol); ranks are assigned on the ROUNDED cosine with id tiebreak so
    * results are reproducible across engines and runs. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms precomputed per side: higher-order folds are interpreted (not
    // whole-stage-codegen'd), so do 1 fold per pair instead of 3
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm")))
    // the exchange materializes n_norm once per row (codegen would defer it
    // into the per-query pair loop) and spreads the O(Q*N) pair stage
    // across the session's shuffle parallelism regardless of file layout
    val c = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_norm"))
      .repartition(fanoutPartitions(vectors))
    rankTopK(
      q.join(c, col("q_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6)),
      "cosine", k)
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

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions with
    * the SAME deterministic md5 Rademacher signs as [[hyperplaneSigns]]:
    * proj[j] = round(dot(vec, signs_j) / sqrt(outDim), 6). Dense +/-1
    * entries satisfy the JL lemma (Achlioptas 2003) — pairwise distances
    * and cosines are preserved to ~1/sqrt(outDim) — so downstream
    * LSH / brute-force / IVF stages run on outDim floats per row instead
    * of `dim`.
    *
    * 100 TB shape: the projection is ONE narrow map pass — outDim native
    * codegen'd dot products per row against literal planes, no shuffle,
    * no state. Projecting 1024-dim embeddings to 64 before the pair
    * stage cuts every downstream distance fold and shuffle payload 16x;
    * the 6-dp rounding makes the projected vectors engine-portable (the
    * DuckDB oracle replays signs and sequential-order dots exactly). */
  def randomProjection(df: DataFrame, vecCol: String, outDim: Int,
                       dim: Int, outCol: String = "proj"): DataFrame = {
    require(outDim >= 1 && outDim <= dim,
      s"outDim must be in [1, dim=$dim], got $outDim")
    val planes = hyperplaneSigns(outDim, dim)
    val scale = math.sqrt(outDim.toDouble)
    df.withColumn(outCol, array(planes.zipWithIndex.map { case (p, j) =>
      round(dot(col(vecCol), array(p.map(lit): _*)) / scale, 6)
    }: _*))
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
    rankTopK(
      q.join(c, Seq("bucket"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(cosine(col("q_vec"), col("n_vec")), 6)),
      "cosine", k)
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
    * every vector is assigned once to its nearest of `numLists` centroids
    * (building inverted lists keyed by `list_id`), and a query scans only
    * its `nprobe` nearest lists instead of the whole collection.
    *
    * Centroids default to deterministic seeds (the `numLists` lowest-id
    * vectors): Lloyd iterations accumulate float sums in partition order,
    * which no independent oracle can reproduce bit-for-bit — so the seeded
    * quantizer is the hash-gated path, and [[kmeansCentroids]] provides the
    * trained refinement via [[ivfAssignWith]]/[[ivfTopKWith]].
    *
    * 100 TB shape: centroids broadcast (numLists is thousands at most);
    * assignment is one narrow pass with a partial-aggregable argmax (no
    * pair shuffle, no window); the candidate join touches nprobe/numLists
    * of the data per query. Cosines are rounded to 6 dp BEFORE every
    * argmax/rank so tiebreaks are reproducible across engines. */
  /** The deterministic seed quantizer: the `numLists` lowest-id vectors as
    * centroids, (centroid_id, c_vec) — the shape [[ivfAssignWith]] expects,
    * and what [[kmeansCentroids]] refines. */
  def seedCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                    numLists: Int): DataFrame =
    vectors.orderBy(col(idCol)).limit(numLists)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("c_vec"))

  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                numLists: Int): DataFrame =
    ivfAssignWith(vectors, idCol, vecCol,
      seedCentroids(vectors, idCol, vecCol, numLists))

  /** IVF assignment against an EXTERNAL centroid table (centroid_id,
    * c_vec) — seeded, k-means-trained, or loaded from a model store. */
  def ivfAssignWith(vectors: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids
      .select(col("centroid_id"), col("c_vec"), l2Norm(col("c_vec")).as("c_norm")))
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
              vecCol: String, k: Int, numLists: Int, nprobe: Int): DataFrame =
    ivfTopKWith(vectors, queries, idCol, vecCol, k, nprobe,
      seedCentroids(vectors, idCol, vecCol, numLists))

  /** IVF search against an external centroid table — the same
    * driver-literal centroid discipline as [[ivfPqTopK]]/[[ivfSqTopK]]
    * (centroid tables are KB-sized by contract): the collection side is
    * ONE codegen'd projection (the [[nearestCentroid]] argmax — no
    * centroid join, no aggregate, no shuffle for assignment), probe
    * selection is a sorted-literal-array slice (cos DESC, centroid ASC —
    * [[ivfAssignWith]]'s tiebreak) and the final rank rides the k-capped
    * aggregate. Zero Window operators, one exchange (the pair fan-out). */
  def ivfTopKWith(vectors: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, nprobe: Int,
                  centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val cand = vectors
      .select(col(idCol).as("neighbor_id"),
        nearestCentroid(col(vecCol), cents).as("list_id"),
        col(vecCol).as("n_vec"), l2Norm(col(vecCol)).as("n_norm"))
      .repartition(fanoutPartitions(vectors))
    val vnorm = l2Norm(col(vecCol))
    val probeScores = cents.zipWithIndex.map { case (cv, cid) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(round(dot(col(vecCol), array(cv.map(lit): _*)) / (vnorm * cn), 6)
        .as("cos"), lit(-cid.toLong).as("negid"))
    }
    val probes = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        vnorm.as("q_norm"),
        explode(slice(sort_array(array(probeScores: _*), asc = false),
          1, nprobe)).as("__probe"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        (-col("__probe.negid")).as("list_id")))
    rankTopK(
      probes.join(cand, Seq("list_id"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6)),
      "cosine", k)
  }

  /** Spherical k-means (Lloyd's) coarse-quantizer trainer for IVF.
    *
    * Assignment is by cosine (matching [[ivfAssignWith]]); the update step
    * is the per-dimension mean of each list's members (the mean's direction
    * is the spherical centroid — cosine normalizes, so no explicit
    * renormalization is needed). Initialized from [[seedCentroids]];
    * empty lists keep their previous centroid.
    *
    * 100 TB shape per iteration: centroids live on the driver (k x dim
    * doubles — KB to low MB) and enter the plan as literal arrays, so
    * assignment is ONE narrow codegen'd pass (argmax over k dot products,
    * no join, no window); the update is a posexplode + (list, dim) groupBy
    * whose result is exactly k x dim rows — map-side combine does the
    * heavy lifting and the collect is centroid-sized, never data-sized.
    *
    * Determinism: the per-dimension double sums follow Spark's partition
    * order, so raw means would not be bit-portable across engines. Every
    * centroid component is therefore ROUNDED TO 6 DP after each Lloyd
    * iteration (the repo's round-before-rank discipline): the ~1e-16
    * relative float-order noise vanishes at 6 dp, the next iteration's
    * assignment argmax sees identical centroids in any engine, and an
    * independent SQL oracle can replay the seeded, rounded iterations
    * hash-exactly.
    *
    * Returns (centroid_id: long 0..k-1, c_vec: array<double>). */
  def kmeansCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    require(k >= 2, "k-means needs k >= 2")
    val spark = vectors.sparkSession
    def rowVec(a: Any): Array[Double] = a match {
      // Row.get yields mutable.ArraySeq — match the collection root, not
      // the immutable alias
      case s: scala.collection.Seq[_] => s.iterator.map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray
      case other => sys.error(s"unexpected vector value: $other")
    }
    var cents: IndexedSeq[Array[Double]] =
      vectors.orderBy(col(idCol)).limit(k).select(col(vecCol)).collect()
        .map(r => rowVec(r.get(0))).toIndexedSeq
    var it = 0
    while (it < iters) {
      val assigned = vectors.select(
        nearestCentroid(col(vecCol), cents).as("list_id"), col(vecCol))
      val means = assigned
        .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("list_id"), col("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .collect()
      val next = Array.tabulate(k)(i => cents(i))
      means.groupBy(_.getAs[Int]("list_id")).foreach { case (cid, rows) =>
        val arr = new Array[Double](cents(cid).length)
        rows.foreach(r => arr(r.getAs[Int]("pos")) = r.getAs[Double]("m"))
        next(cid) = arr
      }
      cents = next.toIndexedSeq
      it += 1
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i.toLong, c.toSeq) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
  }

  /** Argmax-cosine list id against DRIVER-side centroids rendered as
    * literal arrays: a single codegen'd projection, the assignment hot
    * path of one Lloyd iteration. Cosines round to 6 dp before the argmax,
    * smallest centroid id wins ties — same tiebreak as [[ivfAssignWith]]. */
  private[operators] def nearestCentroid(vecCol: Column, cents: Seq[Array[Double]]): Column = {
    val vnorm = l2Norm(vecCol)
    val scored = cents.zipWithIndex.map { case (c, cid) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct(round(dot(vecCol, array(c.map(lit): _*)) / (vnorm * cn), 6).as("cos"),
        lit(-cid).as("neg_id"))
    }
    -greatest(scored: _*).getField("neg_id")
  }

  /** Scalar quantization (SQ8 — the FAISS ScalarQuantizer shape, the
    * third member of the vector-compression trio beside IVF pruning and
    * PQ codes): each vector compresses to ONE per-vector scale plus int8
    * codes, scale = round(max|v_i| / 127, 6) and
    * code_i = clamp(round(v_i / scale), ±127) — 4x smaller than float32
    * with NO codebook to train, and a candidate's asymmetric dot against
    * a full-precision query reads scale * Σ code_i * q_i.
    *
    * Deterministic end-to-end: the 6-dp scale, the half-away-from-zero
    * code rounding and the ascending-index dot fold all reproduce
    * bit-identically in DuckDB, so codes, dots and ranks are hash-gated.
    * The clamp matters: a scale that rounds DOWN can push max|v|/scale
    * past 127.0, and an unclamped round would emit 128 — outside int8.
    * Zero vectors quantize to scale 0 / all-zero codes (dot 0). One
    * narrow projection pass — no join, no shuffle, no state. */
  def sqQuantize(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
      // scale staged as its own projection: the per-component lambda is
      // interpreted (no codegen CSE) and must read a materialized scale,
      // not recompute the array max per element
      .select(col(idCol), col("__v"),
        round(array_max(transform(col("__v"), x => abs(x))) / 127.0, 6)
          .as("scale"))
      .select(col(idCol), col("scale"),
        when(col("scale") > 0,
          transform(col("__v"), x =>
            least(lit(127L), greatest(lit(-127L),
              round(x / col("scale"), 0).cast("long"))).cast("int")))
          .otherwise(transform(col("__v"), _ => lit(0))).as("codes"))

  /** Asymmetric SQ8 top-k (maximum inner product): the query side stays
    * full-precision and broadcasts; the collection side is int8 codes +
    * one scale per vector — the memory-bound ANN regime at 100 TB, where
    * scan bytes and cache residency dominate: 4x fewer candidate bytes
    * than float32, one multiply per component, no codebook. Compose with
    * the IVF lists to prune the scan, exactly like PQ.
    * adot = round(scale * Σ code_i * q_i, 6); ties break on neighbor id. */
  def sqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      transform(col(vecCol), _.cast("double")).as("q_vec")))
    // the exchange materializes the encode once per row (codegen would
    // defer it into the per-query pair loop — see pqTopKWith) and spreads
    // the O(Q*N) pair stage independent of file splits
    val enc = sqQuantize(vectors, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("scale"),
        transform(col("codes"), _.cast("double")).as("__codes"))
      .repartition(fanoutPartitions(vectors))
    rankTopK(
      q.join(enc, col("q_id") =!= col("neighbor_id"))
        .withColumn("adot",
          round(col("scale") * dot(col("__codes"), col("q_vec")), 6)),
      "adot", k)
  }

  /** Two-tier search — the standard production ANN composition: a CHEAP
    * compressed first pass (the SQ8 asymmetric dot, 4x fewer candidate
    * bytes) produces a per-query shortlist of `shortlist` ids, and only
    * those pay the exact full-precision cosine before the final top-k.
    * Recall loss is bounded by the shortlist depth (shortlist >> k);
    * ordering inside the final k is EXACT cosine, so downstream
    * consumers see the same scores as brute force for the survivors.
    *
    * 100 TB shape: the collection-sized work is the SQ8 scan (already
    * the memory-bound optimum); the re-rank touches queries x shortlist
    * rows — the shortlist side is tiny and AQE broadcasts it into the
    * vector join, so full-precision vectors are read once, never
    * shuffled. Both ranks ride the k-capped aggregate (no windows).
    * Same determinism discipline: 6-dp rounds before every rank. */
  def sqRerankTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must cover k ($k)")
    val short = sqTopK(vectors, queries, idCol, vecCol, shortlist)
      .select(col("q_id"), col("neighbor_id"))
    val v = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("n_vec"), l2Norm(col(vecCol)).as("n_norm"))
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), l2Norm(col(vecCol)).as("q_norm")))
    rankTopK(
      short.join(v, Seq("neighbor_id"))
        .join(q, Seq("q_id"))
        .withColumn("cosine",
          round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6)),
      "cosine", k)
  }

  /** Binary (1-bit) quantization: each vector compresses to its packed
    * sign bits (bit i set iff v_i > 0) — 32x smaller than float32, the
    * most aggressive member of the compression ladder (SQ8 4x, PQ ~D/m x,
    * binary 32x). Sign-of-dimension IS sign-random-projection LSH
    * (Charikar 2002) with axis-aligned hyperplanes, so hamming distance
    * between codes approximates angular distance — the FAISS
    * IndexBinaryFlat shape. One narrow codegen'd projection pass; no
    * join, no shuffle. Returns (id, words: array<long>). */
  def bqPack(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors.select(col(idCol),
      graft.functions.VectorExpressions.signPackNative(col(vecCol)).as("words"))

  /** Binary top-k: both sides pack to sign bits, hamming distance ranks
    * ASCENDING with neighbor-id tiebreak. The candidate scan costs one
    * xor + popcount per 64 dims — the cheapest possible first pass; at
    * 100 TB the collection's codes are 32x fewer scan bytes than the raw
    * embeddings, and the whole pair stage is codegen'd end-to-end. */
  def bqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int): DataFrame = {
    val q = broadcast(bqPack(queries, idCol, vecCol)
      .select(col(idCol).as("q_id"), col("words").as("q_words")))
    // the exchange materializes the packing once per row (codegen would
    // defer it into the per-query pair loop) and spreads the O(Q*N) pair
    // stage independent of file splits — the sqTopK discipline
    val c = bqPack(vectors, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("words").as("n_words"))
      .repartition(fanoutPartitions(vectors))
    rankTopK(
      q.join(c, col("q_id") =!= col("neighbor_id"))
        .withColumn("hamming", graft.functions.VectorExpressions
          .hammingNative(col("q_words"), col("n_words"))),
      "hamming", k, ascending = true)
  }

  /** Two-tier binary search — hamming shortlist, exact-cosine re-rank:
    * the binary twin of [[sqRerankTopK]]. The collection-sized work is
    * the 1-bit hamming scan; only queries x shortlist rows pay the
    * full-precision cosine (AQE broadcasts the tiny shortlist into the
    * vector join), so survivors carry the same scores as brute force.
    * Both ranks ride the k-capped aggregate — no windows. */
  def bqRerankTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must cover k ($k)")
    val short = bqTopK(vectors, queries, idCol, vecCol, shortlist)
      .select(col("q_id"), col("neighbor_id"))
    val v = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("n_vec"), l2Norm(col(vecCol)).as("n_norm"))
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), l2Norm(col(vecCol)).as("q_norm")))
    rankTopK(
      short.join(v, Seq("neighbor_id"))
        .join(q, Seq("q_id"))
        .withColumn("cosine",
          round(dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 6)),
      "cosine", k)
  }

  /** Product quantization (Jégou et al. 2011, "Product Quantization for
    * Nearest Neighbor Search"): the vector splits into `m` subvectors,
    * each encoded as the id of its nearest codeword in a per-subspace
    * codebook, compressing a D-dim float vector to m small ints. Search
    * uses ASYMMETRIC DISTANCE (ADC): the query precomputes its m x k'
    * subspace-distance table once, and each candidate costs m table
    * lookups instead of D multiplications.
    *
    * Codebooks here are SEEDED deterministically (the `codewords`
    * lowest-id vectors' subvector slices — the same discipline as
    * [[seedCentroids]]), and every distance is rounded to 6 dp before any
    * argmin/rank, so codes and rankings are engine-portable. A trained
    * refinement can swap in any codebook table with the same shape.
    *
    * 100 TB shape: codebooks are m x k' x (D/m) doubles — KB — collected
    * once and entering plans as literals; encoding is ONE narrow
    * projection pass (no join, no shuffle); ADC is a broadcast of the
    * (tiny) query table + a scan of the encoded collection with O(m)
    * work per pair. Compose with the IVF lists ([[ivfAssignWith]]) to
    * prune the scan — PQ compresses, IVF prunes.
    */
  def pqCodebooks(vectors: DataFrame, idCol: String, vecCol: String,
                  m: Int, codewords: Int): DataFrame = {
    val seeds = vectors.orderBy(col(idCol)).limit(codewords)
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
    val subLen = (size(col("__v")) / lit(m)).cast("int")
    // one row per (subspace, codeword): the seed's s-th slice
    seeds
      .select(col(idCol), col("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("sub"),
        col(idCol), slice(col("__v"), col("sub") * subLen + 1, subLen).as("c_sub"))
      .withColumn("code_id",
        row_number().over(Window.partitionBy(col("sub")).orderBy(col(idCol)))
          .cast("long") - 1)
      .select(col("sub"), col("code_id"), col("c_sub"))
  }

  /** Rounded squared L2 distance between a slice of `vec` and a literal
    * codeword, computed as an ascending-index diff-square fold — the
    * exact expression an independent SQL engine replays. Used only on the
    * tiny broadcast query side (the collection side encodes natively). */
  private def subDist(vec: Column, start: Int, cw: Array[Double]): Column =
    round(aggregate(
      zip_with(slice(vec, start + 1, cw.length), array(cw.map(lit): _*),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v), 6)

  /** [[subDist]] against an ALREADY-SLICED double subvector column —
    * interpreted cross-check reference for the native PQ encode. */
  private[operators] def subDistSliced(sub: Column, cw: Array[Double]): Column =
    round(aggregate(
      zip_with(sub, array(cw.map(lit): _*),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v), 6)

  /** Per-subspace slice columns (`__s0..__s{m-1}`) plus the double-cast
    * full vector (`__v`), staged as projections: the higher-order
    * distance expressions are interpreted (no codegen CSE), so slicing
    * inside each of the k' codeword distances would recompute cast+slice
    * k' times per subspace per row. A projection per step evaluates each
    * alias once; CollapseProject keeps the staging because every alias is
    * referenced k' times. */
  private[operators] def withSubspaceSlices(vectors: DataFrame, idCol: String,
                                            vecCol: String, m: Int, subLen: Int): DataFrame =
    vectors
      .select(col(idCol),
        transform(col(vecCol), _.cast("double")).as("__v"))
      .select(col(idCol) +: col("__v") +:
        (0 until m).map(s => slice(col("__v"), s * subLen + 1, subLen).as(s"__s$s")): _*)

  /** Argmin over a subspace's codewords given the sliced subvector:
    * least (dist, code) struct — smallest distance, then smallest code
    * id, same tiebreak as the oracle. */
  private[operators] def codeArgmin(sub: Column, cws: IndexedSeq[Array[Double]]): Column =
    least(cws.zipWithIndex.map { case (cw, c) =>
      struct(subDistSliced(sub, cw).as("d"), lit(c.toLong).as("c"))
    }: _*).getField("c")

  /** Encode every vector as its m nearest-codeword ids — a single
    * projection pass against driver-literal codebooks, with the whole
    * m x k' x subLen argmin inside one codegen'd native expression
    * (bit-identical to [[pqEncodeWithFold]], the interpreted reference).
    * Returns (idCol, codes: array<long>). */
  def pqEncodeWith(vectors: DataFrame, idCol: String, vecCol: String,
                   codebooks: DataFrame): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    vectors.select(col(idCol),
      graft.functions.VectorExpressions
        .pqEncodeNative(col(vecCol), cbs.map(_.toSeq)).as("codes"))
  }

  /** The interpreted fold composition [[pqEncodeWith]] replaced — kept so
    * the specs can pin native-vs-fold bit-equality. */
  private[operators] def pqEncodeWithFold(vectors: DataFrame, idCol: String,
                                          vecCol: String, codebooks: DataFrame): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    val subLen = cbs(0)(0).length
    withSubspaceSlices(vectors, idCol, vecCol, cbs.length, subLen)
      .select(col(idCol),
        array(cbs.indices.map(s => codeArgmin(col(s"__s$s"), cbs(s))): _*)
          .as("codes"))
  }

  /** ADC top-k: each query precomputes its m x k' distance table ONCE
    * (broadcast with the query row); a candidate then costs m lookups.
    * Distances are rounded before summation and ranking; ties break on
    * neighbor id. Scans the whole collection — compose with IVF lists to
    * prune. */
  def pqTopKWith(vectors: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, codebooks: DataFrame): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    val subLen = cbs(0)(0).length
    // dtab[s][c] = rounded distance from the query's s-th slice to
    // codeword c — m x k' doubles per query row
    val dtab = array(cbs.indices.map { s =>
      array(cbs(s).map(cw => subDist(col(vecCol), s * subLen, cw)): _*)
    }: _*)
    val q = broadcast(queries.select(col(idCol).as("q_id"), dtab.as("__dtab")))
    // materialize codes BEFORE the Q-way pair fan-out: whole-stage codegen
    // defers a deterministic projection to first use, which sits inside the
    // broadcast join's per-build-row loop — without a boundary the encode
    // re-runs once per (row x query) pair. The explicit exchange of the
    // narrow encoded frame (id + m codes, ~1% of the vector bytes) also
    // decouples pair-stage parallelism from the input file layout.
    val enc = pqEncodeWith(vectors, idCol, vecCol, codebooks)
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .repartition(fanoutPartitions(vectors))
    rankTopK(
      q.join(enc, col("q_id") =!= col("neighbor_id"))
        .withColumn("adc_dist",
          round(graft.functions.VectorExpressions
            .adcNative(col("__dtab"), col("codes")), 6)),
      "adc_dist", k, ascending = true)
  }

  /** The interpreted ADC fold [[pqTopKWith]]/[[ivfPqTopK]] replaced — kept
    * so the specs can pin native-vs-fold bit-equality. */
  private[operators] def adcDistFold(dtab: Column, codes: Column): Column =
    round(aggregate(
      zip_with(dtab, codes, (row, c) => element_at(row, (c + 1).cast("int"))),
      lit(0.0), (acc, v) => acc + v), 6)

  /** IVF + PQ — the FAISS-style composition: the coarse quantizer PRUNES
    * (a query scans only its `nprobe` nearest inverted lists) and PQ
    * COMPRESSES (candidates are scored by ADC lookups, not full-vector
    * math). Both the centroid table and the codebooks are KB-sized and
    * collected to driver literals, so the entire fact side is ONE narrow
    * projection pass — list assignment argmax + m encode argmins — with
    * no join, shuffle or window touching the collection; the per-query
    * work is a broadcast join against the probed lists.
    *
    * Same determinism discipline as the components: cosines and subspace
    * distances round to 6 dp before every argmax/argmin/rank. */
  def ivfPqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nprobe: Int,
                centroids: DataFrame, codebooks: DataFrame): DataFrame = {
    // NOT overlapped: an r16 A/B ran the two KB-sized fit collects as
    // concurrent actions (guide §2.6) and measured 1.23 -> 1.39 s on
    // ann_ivfpq while untouched neighbors drifted the same band — the
    // two ~50 ms round-trips are too small to pay for thread/contention
    // overhead, unlike the corpus-scale searches in annRecall
    val cents = collectCentroids(centroids)
    val cbs = collectCodebooks(codebooks)
    val subLen = cbs(0)(0).length
    // ONE pass over the collection: list id + PQ codes, both from
    // literals — the centroid argmax and the whole PQ encode are native
    // codegen'd expressions straight off the raw float vector, so the
    // fact side is a single WholeStageCodegen projection
    // the explicit exchange materializes list_id + codes before the probe
    // join — codegen's deferred evaluation would otherwise re-run the
    // encode once per matched probe (see pqTopKWith) — and parallelizes
    // the ADC stage independent of file splits
    val cand = vectors
      .select(
        col(idCol).as("neighbor_id"),
        nearestCentroid(col(vecCol), cents).as("list_id"),
        graft.functions.VectorExpressions
          .pqEncodeNative(col(vecCol), cbs.map(_.toSeq)).as("codes"))
      .repartition(fanoutPartitions(vectors))
    // per query: nprobe nearest lists + the ADC table — probe selection is
    // a sorted-literal-array slice, no window anywhere. struct(cos, -cid)
    // sorted DESC orders by cosine desc then centroid id ASC on ties,
    // matching ivfTopKWith's probe ranking.
    val vnorm = l2Norm(col(vecCol))
    val probeScores = cents.zipWithIndex.map { case (cv, cid) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(round(dot(col(vecCol), array(cv.map(lit): _*)) / (vnorm * cn), 6).as("cos"),
        lit(-cid.toLong).as("negid"))
    }
    val dtab = array(cbs.indices.map { s =>
      array(cbs(s).map(cw => subDist(col(vecCol), s * subLen, cw)): _*)
    }: _*)
    val probes = broadcast(queries
      .select(col(idCol).as("q_id"), dtab.as("__dtab"),
        explode(slice(sort_array(array(probeScores: _*), asc = false),
          1, nprobe)).as("__probe"))
      .select(col("q_id"), col("__dtab"),
        (-col("__probe.negid")).as("list_id")))
    rankTopK(
      probes.join(cand, Seq("list_id"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("adc_dist",
          round(graft.functions.VectorExpressions
            .adcNative(col("__dtab"), col("codes")), 6)),
      "adc_dist", k, ascending = true)
  }

  /** IVF + SQ8 — the most-deployed production composition at the
    * memory-bound tier: the coarse quantizer PRUNES (each query scans
    * only its `nprobe` nearest inverted lists, like [[ivfPqTopK]]) and
    * SQ8 COMPRESSES candidates to int8 codes + one scale with NO
    * codebook to train — simpler ops than IVF-PQ at 4x (vs 32x)
    * compression, the usual first stop before PQ is warranted. The
    * whole collection side is ONE projection pass (centroid argmax +
    * [[sqQuantize]]'s scale/codes) behind a single round-robin
    * materialization; per-query work is a broadcast join against the
    * probed lists, one asymmetric dot per candidate. Same determinism
    * discipline as every component — 6-dp rounds before argmax/rank, so
    * the whole path hash-gates. Codes are staged as doubles for the
    * native dot; the int8 domain (the clamp) is what bounds storage. */
  def ivfSqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nprobe: Int,
                centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val cand = vectors
      .select(col(idCol).as("neighbor_id"),
        nearestCentroid(col(vecCol), cents).as("list_id"),
        transform(col(vecCol), _.cast("double")).as("__v"))
      .withColumn("scale",
        round(array_max(transform(col("__v"), x => abs(x))) / 127.0, 6))
      .select(col("neighbor_id"), col("list_id"), col("scale"),
        when(col("scale") > 0,
          transform(col("__v"), x =>
            least(lit(127L), greatest(lit(-127L),
              round(x / col("scale"), 0).cast("long"))).cast("double")))
          .otherwise(transform(col("__v"), _ => lit(0.0))).as("__codes"))
      .repartition(fanoutPartitions(vectors))
    val vnorm = l2Norm(col(vecCol))
    val probeScores = cents.zipWithIndex.map { case (cv, cid) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(round(dot(col(vecCol), array(cv.map(lit): _*)) / (vnorm * cn), 6)
        .as("cos"), lit(-cid.toLong).as("negid"))
    }
    val probes = broadcast(queries
      .select(col(idCol).as("q_id"),
        transform(col(vecCol), _.cast("double")).as("q_vec"),
        explode(slice(sort_array(array(probeScores: _*), asc = false),
          1, nprobe)).as("__probe"))
      .select(col("q_id"), col("q_vec"),
        (-col("__probe.negid")).as("list_id")))
    rankTopK(
      probes.join(cand, Seq("list_id"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("adot",
          round(col("scale") * dot(col("__codes"), col("q_vec")), 6)),
      "adot", k)
  }

  /** IVF + binary codes — the pruning quantizer composed with the 1-bit
    * compressor, completing the IVF x {PQ, SQ8, binary} composition
    * matrix: probe selection is the ivfSqTopK literal-centroid
    * discipline (assignment = codegen'd argmax projection, probes = a
    * sorted-literal-array slice, queries broadcast), and the probed-list
    * scan pays ONE xor + popcount per 64 dims against 32x-compressed
    * codes — the cheapest per-candidate cost of any tier. Rank ascending
    * on hamming with neighbor-id ties, through the k-capped aggregate.
    * Compose with [[bqRerankTopK]]'s exact re-rank for survivor scores. */
  def ivfBqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nprobe: Int,
                centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val cand = vectors
      .select(col(idCol).as("neighbor_id"),
        nearestCentroid(col(vecCol), cents).as("list_id"),
        graft.functions.VectorExpressions.signPackNative(col(vecCol))
          .as("n_words"))
      .repartition(fanoutPartitions(vectors))
    val vnorm = l2Norm(col(vecCol))
    val probeScores = cents.zipWithIndex.map { case (cv, cid) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(round(dot(col(vecCol), array(cv.map(lit): _*)) / (vnorm * cn), 6)
        .as("cos"), lit(-cid.toLong).as("negid"))
    }
    val probes = broadcast(queries
      .select(col(idCol).as("q_id"),
        graft.functions.VectorExpressions.signPackNative(col(vecCol))
          .as("q_words"),
        explode(slice(sort_array(array(probeScores: _*), asc = false),
          1, nprobe)).as("__probe"))
      .select(col("q_id"), col("q_words"),
        (-col("__probe.negid")).as("list_id")))
    rankTopK(
      probes.join(cand, Seq("list_id"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("hamming", graft.functions.VectorExpressions
          .hammingNative(col("q_words"), col("n_words"))),
      "hamming", k, ascending = true)
  }

  /** Explicit partition count for a pre-pair-join exchange: the session's
    * shuffle parallelism. A plain `repartition(col)` would let AQE coalesce
    * the (tiny) encoded frame back to one partition — exactly the
    * single-task pair stage the exchange exists to prevent. */
  private def fanoutPartitions(df: DataFrame): Int =
    try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    catch { case _: Exception => df.sparkSession.sparkContext.defaultParallelism }

  /** (centroid_id, c_vec) table -> driver-side literal arrays ordered by
    * centroid id. Centroid tables are KB-sized by construction. */
  private[operators] def collectCentroids(centroids: DataFrame): IndexedSeq[Array[Double]] =
    centroids.select(col("centroid_id"), col("c_vec")).collect()
      .map(r => (r.getLong(0), toDoubleArray(r.get(1))))
      .sortBy(_._1).map(_._2).toIndexedSeq

  /** (sub, code_id, c_sub) -> per-subspace codeword arrays, ordered by
    * code id. Codebooks are KB-sized by construction. */
  private def collectCodebooks(codebooks: DataFrame): IndexedSeq[IndexedSeq[Array[Double]]] =
    codebooks.collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Long]("code_id"),
        toDoubleArray(r.get(2))))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toIndexedSeq)

  /** Row.get of an array column yields a Seq of Float (raw embeddings) or
    * Double (trained centroids) — normalize to doubles. */
  private def toDoubleArray(a: Any): Array[Double] = a match {
    case s: scala.collection.Seq[_] => s.iterator.map {
      case f: Float => f.toDouble
      case d: Double => d
      case n: Number => n.doubleValue()
    }.toArray
    case other => sys.error(s"unexpected vector value: $other")
  }

  /** Semantic dedup over the coarse quantizer (the SemDeDup recipe,
    * Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with
    * k-means, call same-cluster vectors above a cosine threshold
    * semantic duplicates, and keep one representative per duplicate
    * group — here the LOWEST id, the deterministic stand-in for the
    * paper's random choice. Returns one row per vector:
    * (idCol, list_id, keep).
    *
    * 100 TB shape: assignment is the same broadcast-centroid argmax as
    * [[ivfAssignWith]] (one narrow pass, no window); the pair join is
    * per-cluster, and k grows with the corpus so cluster size — and the
    * per-key join fan-out — stays bounded (the paper runs 50k clusters
    * for LAION-scale). A vector is dropped iff SOME smaller-id
    * clustermate clears the threshold, so the join can early-out via
    * the aggregated max — no pair materialization leaves the shuffle.
    *
    * Thresholding happens on the 6-dp ROUNDED cosine so the keep set is
    * engine-portable (boundary pairs land identically in any engine). */
  /** `maxClusterSize` caps the per-cluster pair fan-out: the within-list
    * join is all-pairs, so one skewed or degenerate cluster — common on
    * exactly the near-duplicate-heavy corpora SemDeDup targets — would
    * otherwise go quadratic in that list. Lists above the cap are split
    * into ceil(n/cap) deterministic md5 sub-lists and pairs form only
    * within a sub-list (the published recipe likewise splits oversized
    * clusters; missing the rare cross-sub duplicate is the accepted
    * trade-off). Cluster sizes come from a groupBy(list_id) aggregate
    * joined back (the count table is centroid-bounded, so AQE
    * broadcasts it) — NOT a count-over-window, whose PARTITION BY
    * list_id would buffer a pathological hot cluster in one task, the
    * exact skew this cap exists for. */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, threshold: Double,
                    maxClusterSize: Int = 10000): DataFrame = {
    // FIVE consumers reach this frame after expansion (the size
    // aggregate, both pair sides' joins, the final verdict join) and
    // Catalyst expands each reference into its own centroid-scoring
    // pass — one lazy checkpoint makes the assignment run once
    val assigned = ivfAssignWith(vectors, idCol, vecCol, centroids)
      .localCheckpoint(false)
    val listSizes = assigned.groupBy(col("list_id"))
      .agg(count(lit(1)).as("__list_n"))
    val subSplit = assigned.join(listSizes, Seq("list_id"))
      .withColumn("__sub",
        pmod(
          conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
          greatest(ceil(col("__list_n") / lit(maxClusterSize.toDouble)), lit(1))
            .cast("long")))
      .drop("__list_n")
    val a = subSplit.select(col("list_id"), col("__sub"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"), col("__norm").as("a_norm"))
    val b = subSplit.select(col("list_id"), col("__sub"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"), col("__norm").as("b_norm"))
    val dups = a.join(b, Seq("list_id", "__sub"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(dot(col("a_vec"), col("b_vec")) /
        (col("a_norm") * col("b_norm")), 6) >= threshold)
      .select(col("b_id")).distinct()
    assigned.join(dups, col(idCol) === col("b_id"), "left")
      .select(col(idCol), col("list_id"), col("b_id").isNull.as("keep"))
  }

  /** Cluster-balanced sampling — the diversity-coreset selection step
    * (cover the embedding space, don't oversample its dense modes):
    * every vector assigns to its nearest centroid ([[ivfAssignWith]]'s
    * argmax, rounded cosines) and each cluster keeps its `perList` race
    * winners by the deterministic md5 key (salted with `seed` — a
    * different seed is a different sample; the same seed reproduces
    * bit-for-bit in any engine). Returns (list_id, pick 1..perList,
    * idCol, race).
    *
    * 100 TB shape: assignment is one broadcast-centroid pass; the
    * per-cluster selection is the k-capped aggregate — partial buffers
    * bound state at perList rows per task per cluster, so a hot cluster
    * splits across tasks instead of becoming one sorted window
    * partition. Output is clusters x perList rows, broadcastable. */
  def clusterBalancedSample(vectors: DataFrame, idCol: String,
                            vecCol: String, centroids: DataFrame,
                            perList: Int, seed: String): DataFrame = {
    require(perList >= 1, s"perList must be positive: $perList")
    val raced = ivfAssignWith(vectors, idCol, vecCol, centroids)
      .select(col(idCol), col("list_id"),
        conv(substring(md5(concat_ws("|", lit(seed),
          col(idCol).cast("string"))), 1, 13), 16, 10).cast("long")
          .as("race"))
    Sampling.topKPerGroup(raced, Seq("list_id"), "race", idCol, perList,
        descending = false, rankCol = "pick", numericIdOrder = true)
      .select(col("list_id"), col("pick"), col(idCol), col("race"))
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

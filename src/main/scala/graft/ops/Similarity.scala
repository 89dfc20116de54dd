package graft.ops

import graft.functions.CosineSimilarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)`).
  *
  * Scale shapes:
  *  - brute force: broadcast the (small) query set, ONE scan of the corpus,
  *    per-query top-k via window — the exact baseline;
  *  - LSH: random-hyperplane signatures (seeded, deterministic) bucket the
  *    corpus map-side; queries probe their own bucket (+ optional multiprobe)
  *    — turns the cross product into a bucket-local join at scale.
  */
object Similarity {

  /** Cosine as a native codegen'd Catalyst expression (no UDF boxing). */
  def cosineCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Deterministic random hyperplanes: nBits × dim gaussian-ish values from
    * SplitMix64 (Box–Muller-free: sum of uniforms is fine for sign tests).
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      val rng = new graft.pipeline.PageGen.Rng(seed ^ TextOps.mix(b + 1L))
      Array.fill(dim)(rng.nextDouble() * 2.0 - 1.0)
    }

  def signBits(vec: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      while (i < vec.length && i < p.length) { dot += vec(i) * p(i); i += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Symmetric per-vector int8 quantization: q_i = ⌊127 · x_i / max|x| + 0.5⌋
    * — the LITERAL floor(x + 0.5) double expression, NOT Math.round, whose
    * exact-tie handling (JDK-6430675) differs from the FP sum at
    * representation-edge values like the largest double below 0.5; the
    * Python mirror computes the identical doubles, so the engines agree
    * bit-for-bit. The per-vector scale CANCELS in cosine, so similarity
    * ranking needs only the int8 bytes — a 4× memory cut for a 100 TB
    * embedding store (4× more corpus per executor, integer dot products),
    * the standard scalar-quantization scale path. Zero vectors quantize to
    * zero bytes.
    */
  def quantizeI8(v: Array[Float]): Array[Byte] = {
    var mx = 0f
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > mx) mx = a; i += 1 }
    val out = new Array[Byte](v.length)
    if (mx == 0f) return out
    val s = 127.0 / mx
    i = 0
    while (i < v.length) {
      out(i) = math.floor(v(i) * s + 0.5).toLong.toByte
      i += 1
    }
    out
  }

  /** Cosine over int8-quantized vectors: exact integer dot/norms, one
    * double division — deterministic across engines (the Python mirror
    * computes the identical integers).
    */
  def cosineI8(a: Array[Byte], b: Array[Byte]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toLong * b(i)
      na += a(i).toLong * a(i)
      nb += b(i).toLong * b(i)
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Exact top-k cosine over the QUANTIZED corpus — [[bruteForceTopK]]'s
    * shape (broadcast queries + per-query window) on int8 vectors: the
    * quantization runs map-side (one pass, no shuffle), the scored join
    * carries 1-byte-per-dim vectors instead of 4, and the ranking is the
    * deterministic (score desc, vec_id asc) the whole ANN family pins.
    * Recall vs the float brute force is a recorded metric (q_ann_recall's
    * q8 row), not a hope.
    */
  def quantizedTopK(embeddings: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qz = CacheRegistry.register(embeddings
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, v) => (id, quantizeI8(v.toArray)) })
      .toDF("vec_id", "q8")
      .persist())
    val queries = qz.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("q8").as("q_q8"))
    val score = udf((a: Array[Byte], b: Array[Byte]) => cosineI8(a, b))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    qz.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("score", score(col("q_q8"), col("q8")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("score"))
  }

  /** Johnson-Lindenstrauss random projection: y_j = (Σ_i x_i · P_ji) /
    * √outDim, the dot folded in ascending dimension order (pinned IEEE
    * order — bit-identical to the graftpy.py jl_project mirror). The
    * projection matrix is the SAME deterministic [[hyperplanes]] family
    * the LSH path uses, so reduced vectors and LSH signatures share one
    * seed convention. Pairwise distances are preserved in expectation
    * (JL lemma) — the cheap pre-step before clustering or IVF at 100 TB:
    * a 64-d → 16-d reduction cuts every downstream distance pass 4×.
    */
  def jlProject(vec: Array[Float], planes: Array[Array[Double]],
      invSqrtM: Double): Array[Double] = {
    val out = new Array[Double](planes.length)
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      while (i < vec.length && i < p.length) { dot += vec(i) * p(i); i += 1 }
      out(j) = dot * invSqrtM
      j += 1
    }
    out
  }

  /** Corpus form: (vec_id, dim, value) long format (the repo convention —
    * array columns never reach the oracle compare). Map-only pass; planes
    * broadcast implicitly via closure (outDim × inDim doubles).
    */
  def reduceDims(
      embeddings: DataFrame,
      outDim: Int = 16,
      inDim: Int = 0, // 0 = derive from the data (lshTopK's discipline) —
      // a hardcoded width would silently TRUNCATE wider embeddings: the
      // jlProject dot runs over min(vec, plane) length, so planes built
      // for 64 dims against 128-dim vectors would project only the first
      // 64 components with no error anywhere
      seed: Long = 0x01dfacadeL): DataFrame = {
    require(outDim > 0 && inDim >= 0)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim =
      if (inDim > 0) inDim
      else {
        // max over the frame, not one arbitrary row — deterministic, and
        // an empty/all-null frame yields an empty RESULT instead of the
        // head() NoSuchElementException the first derivation had
        val m = embeddings.filter(col("embedding").isNotNull)
          .agg(max(size(col("embedding")))).collect()(0)
        if (m.isNullAt(0)) 0 else m.getInt(0)
      }
    if (dim <= 0)
      return spark.emptyDataset[(Long, Int, Double)]
        .toDF("vec_id", "dim", "value")
    val planes = hyperplanes(outDim, dim, seed)
    val invSqrtM = 1.0 / math.sqrt(outDim.toDouble)
    embeddings.filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val y = jlProject(v, planes, invSqrtM)
        y.iterator.zipWithIndex.map { case (value, j) => (id, j, value) }
      }.toDF("vec_id", "dim", "value")
  }

  /** Exact top-k cosine neighbors for each query vector (vec_id in the query
    * set) via broadcast + window. Excludes self-matches. Deterministic
    * tie-break on (score desc, vec_id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    embeddings.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("score", cosineCol(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("score"))
  }

  /** LSH-bucketed ANN: corpus and queries signed with the same hyperplanes;
    * candidates = same bucket; exact cosine re-rank within bucket. Recall is
    * traded for the bucket-local join — the 100 TB path.
    */
  /** Query-side multiprobe buckets: the exact bucket plus (when
    * `probeHamming1`) every bucket at Hamming distance 1 — the standard
    * recall lever that costs nothing on the corpus side (only queries fan
    * out). Depth-k probing beyond Hamming 1 is not implemented; the
    * parameter is a Boolean so the signature says exactly what it does.
    */
  def probeBuckets(sig: Long, nBits: Int, probeHamming1: Boolean): Array[Long] =
    if (!probeHamming1) Array(sig)
    else Array(sig) ++ (0 until nBits).map(b => sig ^ (1L << b))

  def lshTopK(
      embeddings: DataFrame,
      queryMaxId: Long,
      k: Int,
      nBits: Int = 6,
      seed: Long = 42L,
      probeHamming1: Boolean = true): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val dim = embeddings.select(size(col("embedding"))).as[Int].head()
    val planes = hyperplanes(nBits, dim, seed)
    val planesB = spark.sparkContext.broadcast(planes)
    val sigUdf = udf((v: Seq[Float]) => signBits(v.toArray, planesB.value))
    val probesUdf = udf((v: Seq[Float]) =>
      probeBuckets(signBits(v.toArray, planesB.value), nBits, probeHamming1))

    val signed = embeddings.withColumn("bucket", sigUdf(col("embedding")))
    // queries probe their own bucket + Hamming-1 neighbors (multiprobe):
    // corpus rows are signed once and never duplicated
    val queries = embeddings.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probesUdf(col("embedding"))).as("bucket"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    signed.join(queries, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"))
      .distinct() // a (q, candidate) pair can collide via several probes
      .withColumn("score", cosineCol(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("score"))
  }

  /** Deterministic Lloyd k-means over a sample (driver-side: the sample is
    * tiny relative to the corpus). Seeded init; an emptied cluster keeps its
    * previous centroid.
    */
  def kmeans(sample: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty k-means sample")
    val dim = sample(0).length
    val rng = new graft.pipeline.PageGen.Rng(seed)
    // init from DISTINCT sample rows (sampling with replacement can freeze a
    // duplicated centroid with an empty list forever): seeded Fisher-Yates
    val idx = Array.tabulate(sample.length)(identity)
    var i0 = sample.length - 1
    while (i0 > 0) {
      val j0 = rng.nextInt(i0 + 1)
      val t = idx(i0); idx(i0) = idx(j0); idx(j0) = t
      i0 -= 1
    }
    val centroids = Array.tabulate(math.min(k, sample.length)) { c =>
      sample(idx(c)).map(_.toDouble)
    }
    @inline def dist2(v: Array[Float], c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { val t = v(i) - c(i); d += t * t; i += 1 }
      d
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      for (v <- sample) {
        var best = 0; var bd = dist2(v, centroids(0))
        var c = 1
        while (c < centroids.length) {
          val d = dist2(v, centroids(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < centroids.length) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
    }
    centroids
  }

  /** Nearest-centroid list ids for a vector (ascending distance, first
    * nProbe).
    */
  def nearestLists(v: Array[Float], centroids: Array[Array[Double]], nProbe: Int): Array[Int] = {
    val dists = centroids.indices.map { c =>
      var d = 0.0; var i = 0
      val n = math.min(v.length, centroids(c).length)
      while (i < n) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
      (d, c)
    }
    dists.sorted.take(nProbe).map(_._2).toArray
  }

  /** IVF (inverted-file) ANN: k-means centroids from a deterministic sample,
    * broadcast; the corpus is assigned map-side to its nearest centroid (the
    * inverted lists — ONE narrow pass, no shuffle of the corpus beyond the
    * list-key join); each query probes its nProbe nearest lists and re-ranks
    * exactly (native cosine expression) inside them. The 100 TB shape:
    * candidate volume ≈ corpus × nProbe / nLists.
    */
  /** Corpus-scaled k-means centroids: nLists ≈ √N (the standard IVF sizing),
    * training sample ≈ 8 vectors per list. The sample is a DISTRIBUTED
    * deterministic hash gate (mix(vec_id) % rate == 0) — every executor
    * decides inclusion locally; no global sort, no orderBy.limit; only the
    * ≈sampleTarget training vectors are ever collected (driver-scale).
    */
  def trainCentroids(
      embeddings: DataFrame,
      nLists: Int = 0,
      seed: Long = 42L,
      sampleTarget: Int = 0,
      knownN: Long = -1L): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // knownN lets a caller that already counted (or persisted) the frame
    // skip this count — semDedupHier trains TWO codebooks off one count
    val n = if (knownN >= 0L) knownN else embeddings.count()
    val lists = if (nLists > 0) nLists else math.max(16, math.sqrt(n.toDouble).round.toInt)
    val target = if (sampleTarget > 0) sampleTarget else math.max(256, lists * 8)
    val rate = math.max(1L, n / target)
    val gate = udf((id: Long) => java.lang.Long.remainderUnsigned(TextOps.mix(id), rate) == 0L)
    val sample = embeddings.filter(gate(col("vec_id")))
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map(_._2.toArray)
    kmeans(sample, lists, iters = 5, seed = seed)
  }

  /** Embedding clustering: assign every vector to its nearest trained
    * centroid — the corpus-organization op of a training-data pipeline
    * (domain mixing, per-cluster sampling quotas, diversity stats). The
    * assignment is map-side against broadcast centroids; the only
    * non-map work is the bounded training collect.
    */
  def clusterAssign(embeddings: DataFrame, k: Int = 0, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    val centroidsB = spark.sparkContext.broadcast(trainCentroids(embeddings, k, seed))
    val assignUdf = udf((v: Seq[Float]) => nearestLists(v.toArray, centroidsB.value, 1)(0))
    embeddings.select(col("vec_id"), assignUdf(col("embedding")).as("cluster"))
  }

  def ivfTopK(
      embeddings: DataFrame,
      queryMaxId: Long,
      k: Int,
      nLists: Int = 0,
      nProbe: Int = 4,
      seed: Long = 42L,
      sampleTarget: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val centroids = trainCentroids(embeddings, nLists, seed, sampleTarget)
    val centroidsB = spark.sparkContext.broadcast(centroids)

    val assignUdf = udf((v: Seq[Float]) => nearestLists(v.toArray, centroidsB.value, 1)(0))
    val probeUdf = udf((v: Seq[Float]) => nearestLists(v.toArray, centroidsB.value, nProbe))

    val listed = embeddings.withColumn("list", assignUdf(col("embedding")))
    val queries = embeddings.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probeUdf(col("embedding"))).as("list"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    listed.join(queries, Seq("list"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", cosineCol(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("score"))
  }

  /** IVF × int8 quantization — the 100 TB memory path COMPOSED: float
    * centroids stay exact (they are tiny and drive both corpus assignment
    * and query probing, so bucketing quality is unaffected), while the
    * CORPUS side carries only int8 bytes into the probe join and the
    * re-rank runs [[cosineI8]] on quantized pairs. Same deterministic
    * (score desc, vec_id asc) ranking as the whole family; recall vs the
    * float brute force is q_ann_recall's recorded `ivf_q8` row.
    */
  def ivfQuantizedTopK(
      embeddings: DataFrame,
      queryMaxId: Long,
      k: Int,
      nLists: Int = 0,
      nProbe: Int = 4,
      seed: Long = 42L,
      sampleTarget: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val centroids = trainCentroids(embeddings, nLists, seed, sampleTarget)
    val centroidsB = spark.sparkContext.broadcast(centroids)

    val assignUdf = udf((v: Seq[Float]) => nearestLists(v.toArray, centroidsB.value, 1)(0))
    val probeUdf = udf((v: Seq[Float]) => nearestLists(v.toArray, centroidsB.value, nProbe))
    val quantUdf = udf((v: Seq[Float]) => quantizeI8(v.toArray))
    val score = udf((a: Array[Byte], b: Array[Byte]) => cosineI8(a, b))

    val base = embeddings
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
    val listed = base
      .select(col("vec_id"), quantUdf(col("embedding")).as("q8"),
        assignUdf(col("embedding")).as("list"))
    val queries = base.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), quantUdf(col("embedding")).as("q_q8"),
        explode(probeUdf(col("embedding"))).as("list"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    listed.join(queries, Seq("list"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", score(col("q_q8"), col("q8")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs in the
    * same bucket with cosine ≥ threshold.
    */
  def embeddingNearDups(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      nBits: Int = 10,
      seed: Long = 42L,
      maxBucketSize: Int = 1000,
      skewFactor: Double = 8.0,
      reportDropped: Boolean = false): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val dim = embeddings.select(size(col("embedding"))).as[Int].head()
    val planes = hyperplanes(nBits, dim, seed)
    val planesB = spark.sparkContext.broadcast(planes)
    val sigUdf = udf((v: Seq[Float]) => signBits(v.toArray, planesB.value))

    // signed corpus is PERSISTED: it feeds the bucket-count aggregate AND
    // both self-join sides — without the cache the hyperplane signing UDF
    // re-runs over the full corpus per consumer
    val signed = CacheRegistry.register(
      embeddings.select(col("vec_id"), col("embedding"))
        .withColumn("bucket", sigUdf(col("embedding")))
        .persist())

    // count-first skew cap (same pattern as Dedup.minhashNearDups): a hot
    // bucket — near-identical boilerplate embeddings all hashing together —
    // must not go quadratic. Counts partial-aggregate; oversized buckets are
    // dropped before pairing.
    // bucketCounts is PERSISTED: bounded by the 2^nBits keyspace, consumed
    // by the median job, the optional drop count, and both self-join sides
    val bucketCounts = CacheRegistry.register(
      signed.groupBy(col("bucket")).agg(count(lit(1)).as("sz")).persist())
    // corpus-adaptive cap (skewFactor x MEDIAN bucket size): a fixed cap
    // would silently empty the output once N exceeds cap x 2^nBits; the
    // median tracks uniform growth and is robust to the hot buckets
    val medRow = bucketCounts.agg(percentile_approx(col("sz"), lit(0.5), lit(10000))).collect()(0)
    val median = if (medRow.isNullAt(0)) 0L else medRow.getLong(0)
    val cap = math.max(maxBucketSize.toLong, (skewFactor * median).toLong)
    if (reportDropped) {
      val dropped = bucketCounts.filter(col("sz") > cap).count()
      if (dropped > 0)
        System.err.println(s"[graft.embdup] dropped $dropped oversized buckets (> $cap)")
    }
    // capped streaming self-join (each vector sits in exactly ONE bucket, so
    // no pair dedup is needed); oversized buckets never reach the join
    val capped = signed
      .join(bucketCounts.filter(col("sz") > 1 && col("sz") <= cap), Seq("bucket"))
      .select(col("bucket"), col("vec_id"), col("embedding"))
    capped.as("l").join(capped.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", cosineCol(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"), col("cos"))
  }

  /** SemDedup (cluster-then-prune semantic dedup, after Abbas et al. 2023):
    * kmeans-cluster the embedding space, then prune any vector with a
    * same-cluster neighbor of cosine ≥ threshold and LOWER vec_id (min-id
    * keeper — the repo's survivor convention, deterministic and
    * relational; a pruned vector needs a DIRECT ≥τ link to a lower id,
    * matching the paper's pairwise rule rather than transitive closure).
    * Output: one row per vector — (vec_id, cluster, status kept|pruned).
    *
    * Scale shape: the pairwise work is confined within clusters, so cost
    * is Σ size² — the paper's trick is k large enough that E[size] stays
    * bounded (k ≈ n/Ē). Defense in depth here: per-cluster count-first
    * sizing, and clusters above `maxClusterSize` skip pairing entirely
    * (all members kept, reported) rather than going quadratic — the same
    * honest cap-and-surface policy as [[embeddingNearDups]]. Assignment
    * is map-side against broadcast centroids; the only driver-side work
    * is the bounded centroid-training sample collect. At 10^12 rows one
    * kmeans level is not enough — the drop-in extension is hierarchical
    * assignment (two nested clusterings), which this op composes with by
    * feeding it a pre-bucketed cluster column.
    */
  def semDedup(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      k: Int = 0,
      seed: Long = 42L,
      maxClusterSize: Int = 10000): DataFrame = {
    val spark = embeddings.sparkSession
    // persist the projected source FIRST so the upstream lineage runs once:
    // trainCentroids' count materializes the cache and its sample scan +
    // the assignment pass read it back (same shape as semDedupHier)
    val src = CacheRegistry.register(
      embeddings.select(col("vec_id"), col("embedding")).persist())
    val centroidsB = spark.sparkContext.broadcast(trainCentroids(src, k, seed))
    val assignUdf = udf((v: Seq[Float]) => nearestLists(v.toArray, centroidsB.value, 1)(0))
    // persisted: feeds the size count, both self-join sides, and the final
    // status join
    val assigned = CacheRegistry.register(
      src.withColumn("cluster", assignUdf(col("embedding")))
        .persist())
    val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
    val joinable = assigned
      .join(sizes.filter(col("sz") > 1 && col("sz") <= maxClusterSize), Seq("cluster"))
      .select(col("cluster"), col("vec_id"), col("embedding"))
    val pruned = joinable.as("l").join(joinable.as("r"),
        col("l.cluster") === col("r.cluster") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", cosineCol(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("r.vec_id").as("vec_id")).distinct()
      .withColumn("__pruned", lit(true))
    assigned.select(col("vec_id"), col("cluster"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("__pruned").isNotNull, lit("pruned")).otherwise(lit("kept"))
          .as("status"))
  }

  /** Hierarchical (two-level) SemDedup — the 10^12-row extension
    * [[semDedup]]'s scaladoc names: vectors assign to the CROSS PRODUCT of
    * two independently-trained codebooks (coarse `k1` × fine `k2`), and
    * the pairwise prune runs within (coarse, fine) cells. Why two levels:
    * at 10^12 rows a flat clustering needs ~10^6 cells to keep E[cell]
    * bounded — a 10^6-centroid codebook is a multi-GB broadcast and a
    * 10^6-way nearest scan per vector — while two ~10^3 codebooks express
    * the same cell count with MB-scale broadcasts and 2·10^3 distance
    * evaluations per vector (the IVF-PQ coarse-quantizer shape). Both
    * assignments are map-side in ONE pass; everything downstream is the
    * same count-first, cap-and-surface discipline as [[semDedup]].
    *
    * Semantics difference from the flat form (by design, like any
    * clustering choice in SemDedup): a ≥τ pair is only pruned when BOTH
    * assignments agree. Defaults size each codebook at N^(1/4) (cells
    * ≈ √N, the flat default's cell count).
    *
    * Output: (vec_id, coarse, fine, status kept|pruned).
    */
  def semDedupHier(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      k1: Int = 0,
      k2: Int = 0,
      seed: Long = 42L,
      maxClusterSize: Int = 10000): DataFrame = {
    val spark = embeddings.sparkSession
    // ONE materialization of the upstream lineage: persist the projected
    // source, count it once (sizes the default codebooks AND both
    // codebooks' sample rates via knownN), and derive the two sample scans
    // + the assignment pass from the cache — the naive form re-ran the
    // possibly-expensive upstream 5× (count + 2×(count+sample) + assign)
    val src = CacheRegistry.register(
      embeddings.select(col("vec_id"), col("embedding")).persist())
    val n = src.count()
    val side = math.max(4, math.round(math.sqrt(math.sqrt(n.toDouble))).toInt)
    val kc = if (k1 > 0) k1 else side
    val kf = if (k2 > 0) k2 else side
    val coarseB = spark.sparkContext.broadcast(
      trainCentroids(src, kc, seed, knownN = n))
    val fineB = spark.sparkContext.broadcast(
      trainCentroids(src, kf, seed + 1, knownN = n))
    val assignCoarse = udf((v: Seq[Float]) =>
      nearestLists(v.toArray, coarseB.value, 1)(0))
    val assignFine = udf((v: Seq[Float]) =>
      nearestLists(v.toArray, fineB.value, 1)(0))
    val assigned = CacheRegistry.register(
      src.withColumn("coarse", assignCoarse(col("embedding")))
        .withColumn("fine", assignFine(col("embedding")))
        .persist())
    val sizes = assigned.groupBy(col("coarse"), col("fine"))
      .agg(count(lit(1)).as("sz"))
    val joinable = assigned
      .join(sizes.filter(col("sz") > 1 && col("sz") <= maxClusterSize),
        Seq("coarse", "fine"))
      .select(col("coarse"), col("fine"), col("vec_id"), col("embedding"))
    val pruned = joinable.as("l").join(joinable.as("r"),
        col("l.coarse") === col("r.coarse") &&
          col("l.fine") === col("r.fine") &&
          col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", cosineCol(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("r.vec_id").as("vec_id")).distinct()
      .withColumn("__pruned", lit(true))
    assigned.select(col("vec_id"), col("coarse"), col("fine"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("coarse"), col("fine"),
        when(col("__pruned").isNotNull, lit("pruned")).otherwise(lit("kept"))
          .as("status"))
  }
}

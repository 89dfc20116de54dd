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
  def lshTopK(
      embeddings: DataFrame,
      queryMaxId: Long,
      k: Int,
      nBits: Int = 6,
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val dim = embeddings.select(size(col("embedding"))).as[Int].head()
    val planes = hyperplanes(nBits, dim, seed)
    val planesB = spark.sparkContext.broadcast(planes)
    val sigUdf = udf((v: Seq[Float]) => signBits(v.toArray, planesB.value))

    val signed = embeddings.withColumn("bucket", sigUdf(col("embedding")))
    val queries = signed.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    signed.join(queries, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", cosineCol(col("q_emb"), col("embedding")))
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
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val dim = embeddings.select(size(col("embedding"))).as[Int].head()
    val planes = hyperplanes(nBits, dim, seed)
    val planesB = spark.sparkContext.broadcast(planes)
    val sigUdf = udf((v: Seq[Float]) => signBits(v.toArray, planesB.value))

    val signed = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", sigUdf(col("embedding")))

    signed.as("l").join(signed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", cosineCol(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"), col("cos"))
  }
}

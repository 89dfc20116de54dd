package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** fasttext-style quality-classifier inference: hashed bag-of-ngrams
  * features (unigrams + word bigrams, hashing trick into a power-of-two
  * bucket space) scored by a linear model — the shape every production
  * curation pipeline uses for its "quality classifier" gate (fasttext /
  * CCNet-style). Inference is STATELESS per row: one map-only pass, no
  * shuffle, no driver state — the 100 TB plan is a scan with a kernel
  * call per row, and a REAL trained model drops in as a broadcast float
  * array indexed by the same buckets.
  *
  * This sandbox ships no trained weights, so the default model is a
  * deterministic stand-in: `w(b) = ((mix(b ^ salt) >>> 53) - 1024) / 1024`
  * — splitmix64-derived DYADIC rationals (multiples of 2^-10, |w| < 1).
  * Dyadic weights × integer term frequencies make every partial sum
  * exactly representable, so the logit is bit-identical in ANY summation
  * order and in any IEEE-754 engine — the clean-room Python golden
  * compares doubles by exact repr and passes without a tolerance.
  * The stand-in is about plumbing determinism, not learned quality; the
  * hashing-trick featurization, bucket layout and threshold gate are the
  * production-real parts.
  */
object Classifier {

  /** Power-of-two bucket space: unsigned-mod == low-bit mask, identical in
    * signed Scala and unsigned Python arithmetic by construction.
    */
  val Dim: Int = 1 << 18

  val WeightSalt: Long = 0xC1A551F1ED5EEDL

  val Bias: Double = -0.25

  /** Deterministic stand-in weight for a bucket (see scaladoc above). */
  @inline def weight(bucket: Int, salt: Long = WeightSalt): Double =
    ((TextOps.mix(bucket.toLong ^ salt) >>> 53) - 1024L) / 1024.0

  @inline private def bucketOf(feature: String): Int =
    (Dedup.stringHash64(feature) & (Dim - 1)).toInt

  final case class Score(docId: Long, logit: Double, nFeatures: Int, label: String)

  /** Score one document: tokens are non-empty space-split words; features
    * are each token plus each adjacent token pair joined by a single space
    * (tokens cannot contain one, so the join is collision-free). Term
    * frequency weighting; `nFeatures` counts DISTINCT active buckets
    * (post-hashing support — collisions collapse, as in the real model).
    */
  def scoreText(docId: Long, text: String, salt: Long = WeightSalt): Score = {
    val toks = Option(text).getOrElse("").split(" ").filter(_.nonEmpty)
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < toks.length) {
      counts.merge(bucketOf(toks(i)), 1, Integer.sum _)
      if (i + 1 < toks.length)
        counts.merge(bucketOf(toks(i) + " " + toks(i + 1)), 1, Integer.sum _)
      i += 1
    }
    var logit = Bias
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      logit += e.getValue * weight(e.getKey, salt)
    }
    Score(docId, logit, counts.size(), if (logit >= 0.0) "keep" else "drop")
  }

  /** DataFrame form over (doc_id, text). */
  def score(docs: DataFrame, salt: Long = WeightSalt): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => scoreText(id, t, salt) }
      .toDF("doc_id", "logit", "n_features", "label")
  }
}

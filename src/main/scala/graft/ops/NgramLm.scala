package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring: train a bigram LM
  * with add-one smoothing on a reference ("known-good") slice of the
  * corpus, then score every document by its bits-per-token under that
  * model — the perplexity-filter gate real pretraining pipelines run
  * (CCNet's KenLM stage). Training is one distributed count aggregation;
  * the model is collected under a HARD entry cap and broadcast, exactly
  * how a pruned filtering LM ships to workers in production; scoring is a
  * stateless map-only pass.
  *
  * Cross-engine determinism: probabilities are exact-integer ratios
  * evaluated in IEEE double division, and log2 is the PINNED portable
  * approximation [[log2Portable]] — a fixed 7-term atanh series evaluated
  * in a fixed operation order, so Scala and the clean-room Python mirror
  * produce bit-identical doubles (both engines' +,*,/ are
  * correctly-rounded IEEE; no libm call whose rounding could differ).
  * Per-doc bit totals sum in token order. The series' ~1e-8 relative
  * error is part of the scoring function's DEFINITION, not a tolerance.
  *
  * OOV handling: tokens outside the training vocabulary map to the unk
  * class, represented structurally as `None` (never a sentinel STRING —
  * crawled tokens can collide with any in-band sentinel). Unk-involving
  * bigrams have zero training count and score through smoothing alone.
  */
object NgramLm {

  /** log2 via exponent split + fixed atanh series on the mantissa.
    * m ∈ [1,2): z = (m-1)/(m+1), ln m = 2z(1 + z²/3 + … + z¹²/13),
    * log2 x = e + ln m · (1/ln 2). Finite positive x only.
    */
  def log2Portable(x: Double): Double = {
    require(x > 0.0 && !x.isInfinite, s"log2Portable domain: $x")
    val e = Math.getExponent(x)
    val m = x / Math.scalb(1.0, e) // exact: power-of-two division
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    var s = 1.0 / 13.0
    s = s * z2 + 1.0 / 11.0
    s = s * z2 + 1.0 / 9.0
    s = s * z2 + 1.0 / 7.0
    s = s * z2 + 1.0 / 5.0
    s = s * z2 + 1.0 / 3.0
    s = s * z2 + 1.0
    e.toDouble + (2.0 * z * s) * 1.4426950408889634
  }

  final case class Model(
      unigram: Map[String, Long],
      bigram: Map[(String, String), Long],
      ctx: Map[String, Long]) {
    /** Smoothing vocabulary: training vocab + the unk class. */
    val v: Long = unigram.size.toLong + 1L
  }

  /** Train unigram/bigram counts distributed, collect under a hard cap.
    * The cap is the broadcast-model contract (a production filtering LM is
    * pruned to fit workers); exceeding it fails loudly rather than
    * silently collecting an unbounded model to the driver.
    */
  def train(refDocs: DataFrame, maxModelEntries: Long = 2000000L): Model = {
    val spark = refDocs.sparkSession
    import spark.implicits._
    val toks = refDocs.select(
      explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    val bigrams = refDocs.select(col("text")).as[String]
      .flatMap { t =>
        val ws = Option(t).getOrElse("").split(" ").filter(_.nonEmpty)
        (0 until math.max(0, ws.length - 1)).iterator
          .map(i => (ws(i), ws(i + 1)))
      }.toDF("w1", "w2")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val unigrams = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nEntries = unigrams.count() + bigrams.count()
    require(nEntries <= maxModelEntries,
      s"LM model has $nEntries entries > cap $maxModelEntries — prune the " +
        "training slice or raise the cap (broadcast-model contract)")
    val u = unigrams.as[(String, Long)].collect().toMap
    val b = bigrams.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val c = b.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    Model(u, b, c)
  }

  /** Bits of one document under the model (sequential token-order sum). */
  def scoreText(text: String, m: Model): (Int, Double) = {
    val ws = Option(text).getOrElse("").split(" ").filter(_.nonEmpty)
    val mapped: Array[Option[String]] =
      ws.map(w => if (m.unigram.contains(w)) Some(w) else None)
    var bits = 0.0
    var i = 0
    while (i + 1 < mapped.length) {
      val cBi = (mapped(i), mapped(i + 1)) match {
        case (Some(a), Some(b)) => m.bigram.getOrElse((a, b), 0L)
        case _ => 0L
      }
      val cCtx = mapped(i) match {
        case Some(a) => m.ctx.getOrElse(a, 0L)
        case None => 0L
      }
      val p = (cBi + 1L).toDouble / (cCtx + m.v).toDouble
      bits += -log2Portable(p)
      i += 1
    }
    (ws.length, bits)
  }

  /** Score a corpus: (doc_id, n_tokens, bits, bits_per_token, bucket).
    * Buckets (CCNet head/middle/tail) use fixed thresholds on
    * bits-per-token; empty/1-token docs have no transitions and bucket as
    * `empty`.
    */
  def score(
      docs: DataFrame,
      model: Model,
      headBelow: Double,
      tailFrom: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mB = spark.sparkContext.broadcast(model)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val (n, bits) = scoreText(t, mB.value)
        val bpt = if (n > 1) bits / (n - 1).toDouble else 0.0
        val bucket =
          if (n <= 1) "empty"
          else if (bpt < headBelow) "head"
          else if (bpt < tailFrom) "middle"
          else "tail"
        (id, n, bits, bpt, bucket)
      }.toDF("doc_id", "n_tokens", "bits", "bits_per_token", "bucket")
  }
}

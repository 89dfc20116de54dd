package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation (domain/language
  * mixing quotas).
  *
  * Scale shape: the gate is a pure per-row hash test against a broadcast
  * quota map — map-side only, NO shuffle, no global count, and the same row
  * is kept or dropped identically on every run and at every parallelism
  * (SplitMix64 of the stable doc_id, not Spark's partition-dependent
  * `sample()`). Rate-based quotas are the web-scale form; an exact-K-per-
  * stratum sample needs a rank threshold (two-phase selection) and is
  * deliberately not offered — at 10^12 rows "0.3% of stratum X" is the
  * operable contract, not "exactly K".
  */
object Sampling {

  /** Keep each row of stratum s with probability ≈ quotas(s) (exact in the
    * hash-uniform limit); strata absent from the map are dropped. Quotas are
    * fixed-point at 1e-6 resolution — thresholds are ROUNDED once up front
    * (truncation would gate a binary-unrepresentable quota like 0.3 one
    * millionth low), and the precomputed map is what the per-row gate reads.
    *
    * Null handling (both drops are CONTRACT, not accident): a null stratum
    * has no quota, so the row is dropped; a null id is dropped by the
    * EXPLICIT isNotNull filter below — the gate needs a stable 64-bit key
    * and there is no principled hash of "unknown id" (without the explicit
    * filter the primitive-parameter UDF would silently null-drop anyway;
    * making it a visible filter documents the behavior in the plan).
    */
  def stratifiedSample(
      documents: DataFrame,
      quotas: Map[String, Double],
      strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    val thresholds: Map[String, Long] =
      quotas.map { case (k, q) => k -> math.floor(q * 1e6 + 0.5).toLong }
    val gate = udf((id: Long, stratum: String) => {
      val t = if (stratum == null) 0L else thresholds.getOrElse(stratum, 0L)
      java.lang.Long.remainderUnsigned(TextOps.mix(id), 1000000L) < t
    })
    documents.filter(col(idCol).isNotNull && gate(col(idCol), col(strataCol)))
  }

  /** Corpus mixing to TARGET PROPORTIONS (the step a mixing policy actually
    * wants: "make the output 50% en / 25% es / 25% de"): computes the
    * maximum achievable output volume T = min_s(count_s / weight_s), turns
    * it into per-stratum keep-rates quota_s = weight_s * T / count_s (the
    * binding stratum keeps 100%), and applies the deterministic
    * [[stratifiedSample]] gate. Strata absent from `weights` are dropped.
    *
    * Scale shape: ONE partial-aggregating count per stratum (driver side
    * holds one row per stratum — bounded by strata cardinality, which is a
    * mixing-policy constant), then the zero-shuffle map-side gate.
    * Deterministic end to end: exact counts, fixed IEEE quota arithmetic
    * (mirrored in the golden oracle), hash gate.
    */
  def mixToWeights(
      documents: DataFrame,
      weights: Map[String, Double],
      strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts: Map[String, Long] = documents
      .filter(col(strataCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.keys.foreach { s =>
      require(counts.getOrElse(s, 0L) > 0L,
        s"stratum '$s' has no documents — target mix unachievable")
    }
    val t = weights.map { case (s, w) => counts(s) / w }.min
    val quotas = weights.map { case (s, w) => s -> (w * t / counts(s)) }
    stratifiedSample(documents, quotas, strataCol, idCol)
  }

  /** Quality-quantile bucketing ("keep the top 25% by quality score"):
    * assigns each row a bucket 0..nBuckets-1 from thresholds computed over
    * a DETERMINISTIC hash-gated sample of the score column.
    *
    * Why sample-based and not exact/approx global quantiles: exact global
    * quantiles need a global sort (scale-killer), and Spark's
    * approxQuantile GK sketch is merge-order-dependent (thresholds change
    * run to run at the error margin — unacceptable for a reproducible
    * curation cut). The SplitMix64 gate picks the SAME rows at every
    * parallelism; the sampled scores sort exactly; the nBuckets-1
    * thresholds broadcast in the bucket closure; assignment is map-side.
    * Sampling error on the CUT POINT is the explicit trade (a ~1e6-row
    * sample puts it well under 0.1% — size `sampleMicros` to the corpus:
    * at 10^12 rows use ~1, at 10^6 rows use ~1e5; the driver-side collect
    * is bounded by `sampleMicros`, which is the documented contract).
    *
    * Threshold convention (pinned, mirrored in the golden oracle):
    * t_i = sortedSample(floor(i*n/B)) for i in 1..B-1; bucket = number of
    * thresholds <= score (ties promote to the upper bucket). Null scores
    * get a null bucket; null ids are never sampled.
    */
  def bucketByScore(
      df: DataFrame,
      nBuckets: Int,
      sampleMicros: Long,
      scoreCol: String = "score",
      idCol: String = "doc_id",
      maxSampleRows: Int = 4000000): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val gate = udf((id: Long) =>
      java.lang.Long.remainderUnsigned(TextOps.mix(id), 1000000L) < sampleMicros)
    // the driver-side collect is HARD-bounded, not just documented: limit
    // maxSampleRows+1 (a no-op when the gate admits fewer — determinism
    // unaffected) and fail loudly on overflow, so a caller pairing a large
    // corpus with a too-high sampleMicros gets an actionable error instead
    // of a driver OOM
    val sample = df
      .filter(col(idCol).isNotNull && gate(col(idCol)) && col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("double"))
      .limit(maxSampleRows + 1)
      .collect().map(_.getDouble(0)).sorted
    require(sample.length <= maxSampleRows,
      s"quantile sample exceeds maxSampleRows=$maxSampleRows — lower " +
        s"sampleMicros (=$sampleMicros) to target ~1e6 sampled rows, or " +
        "raise maxSampleRows explicitly")
    require(sample.nonEmpty,
      s"quantile sample is empty — raise sampleMicros (=$sampleMicros)")
    val n = sample.length
    val thresholds = (1 until nBuckets)
      .map(i => sample((i.toLong * n / nBuckets).toInt)).toArray
    val bucketUdf = udf((score: Double) => {
      var b = 0
      while (b < thresholds.length && score >= thresholds(b)) b += 1
      b
    })
    df.withColumn("bucket", bucketUdf(col(scoreCol).cast("double")))
  }

  /** Deterministic training-shard assignment (the "global shuffle" a
    * training run wants, without a global sort): every row gets a shard and
    * a position within that shard, both functions of `md5(idCol)` alone —
    * so the layout is reproducible by ANY system that can compute md5
    * (the DuckDB oracle replays it byte-for-byte), independent of
    * parallelism, partitioning, and input order.
    *
    * Scale shape: the shard id is the first hex nibble of the md5 — pure
    * map-side, no shuffle. The position is a `row_number` under a window
    * PARTITIONED BY shard (hash exchange into nShards balanced groups, each
    * sorted independently) — there is deliberately no global-order window
    * anywhere. `nShards` must divide 16 so nibble→shard folding is exactly
    * balanced in the hash-uniform limit; for more output shards, compose
    * with a second nibble (not offered until needed).
    *
    * Null ids are rejected up front (an explicit filter in the plan): a
    * shard layout that silently drops rows is worse than one that
    * documents it.
    */
  def shardAssign(
      df: DataFrame,
      nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1 && 16 % nShards == 0,
      s"nShards must divide 16 for balanced nibble folding: $nShards")
    val a = ascii(substring(col("__key"), 1, 1))
    val nibble = when(a <= 57, a - 48).otherwise(a - 87)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("__key", md5(col(idCol).cast("string")))
      .withColumn("shard", pmod(nibble, lit(nShards)))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("__key")
  }
}

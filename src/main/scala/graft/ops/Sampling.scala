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
}

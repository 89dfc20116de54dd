package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phrase-blocklist matching — the bad-words / unsafe-content gate every
  * production curation pipeline runs (the C4 paper's "List of Dirty,
  * Naughty … Words" stage). Semantics pinned (mirrored clean-room in
  * graftpy bl_*):
  *
  *   - documents and phrases tokenize on the repo-wide whitespace
  *     convention (split on ' ', empty tokens dropped) and ASCII
  *     case-fold;
  *   - a HIT is a contiguous token subsequence equal to a phrase's
  *     token sequence (token-boundary semantics — "class" never hits a
  *     blocklisted "ass", the classic substring-matcher false positive);
  *   - hits are counted at every starting position, overlaps included;
  *     `n_matches` totals them, `n_phrases` counts distinct phrases hit.
  *
  * Scale shape: the phrase set broadcasts GROUPED BY LENGTH into
  * per-length hash sets; matching is one pass over each document's
  * token stream probing |lengths| windows per position — O(tokens ×
  * distinct phrase lengths) with zero shuffle and no explode (a
  * token-n-gram explode would multiply the corpus ~|lengths|× before
  * its join). Map-only; the verdict filter composes downstream.
  */
object Blocklist {

  @inline private def fold(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') needs = true
      i += 1
    }
    if (!needs) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        j += 1
      }
      sb.toString
    }
  }

  private[ops] def tokensOf(text: String): Array[String] =
    if (text == null) Array.empty
    else text.split(" ").iterator.filter(_.nonEmpty).map(fold).toArray

  /** (n_matches, distinct phrases hit) for one token stream against the
    * per-length phrase sets.
    */
  private[ops] def scan(
      tokens: Array[String],
      byLen: Map[Int, Set[String]]): (Int, Set[String]) = {
    var n = 0
    var hit = Set.empty[String]
    val lens = byLen.keysIterator.toArray
    var i = 0
    while (i < tokens.length) {
      var li = 0
      while (li < lens.length) {
        val L = lens(li)
        if (i + L <= tokens.length) {
          // join with a space: phrase keys were built the same way, and
          // folded tokens contain no spaces, so the key is injective
          val window = tokens.slice(i, i + L).mkString(" ")
          if (byLen(L).contains(window)) { n += 1; hit += window }
        }
        li += 1
      }
      i += 1
    }
    (n, hit)
  }

  /** One row per document: (doc_id, n_matches, n_phrases, keep) where
    * keep = n_matches <= maxMatches. Null-id rows drop; null text scans
    * as empty (kept).
    */
  def matchCounts(
      docs: DataFrame,
      phrases: Seq[String],
      maxMatches: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val byLen: Map[Int, Set[String]] = phrases.iterator
      .map(p => tokensOf(p))
      .filter(_.nonEmpty)
      .map(_.mkString(" "))
      .toSet // duplicate phrases in the list count once
      .groupBy((k: String) => k.count(_ == ' ') + 1)
      .map { case (l, ks) => l -> ks }
    val byLenB = spark.sparkContext.broadcast(byLen)
    docs.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
      .as[(Long, String)]
      .map { case (id, t) =>
        val (n, hit) = scan(tokensOf(t), byLenB.value)
        (id, n, hit.size, n <= maxMatches)
      }
      .toDF("doc_id", "n_matches", "n_phrases", "keep")
  }
}

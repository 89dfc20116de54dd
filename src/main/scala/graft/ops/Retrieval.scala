package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 top-k retrieval over the document corpus — the primitive behind
  * retrieval-based decontamination ("which training docs does this eval
  * query pull up?"), RAG-corpus audits, and quality probes. Okapi BM25
  * (k1=1.2, b=0.75), space-token terms, query-side broadcast.
  *
  * Cross-engine determinism (the repo's no-float-sums-in-oracles rule):
  *   - idf uses the PINNED portable log ([[NgramLm.log2Portable]] × ln 2)
  *     — no libm call whose rounding could differ between engines;
  *   - every per-(query, doc) score folds its term contributions in QUERY
  *     TERM ORDER (`aggregate(sort_array(collect_list(struct(term_pos,
  *     contrib))))`) — a pinned addition order, so scores are bit-identical
  *     to the clean-room Python mirror at any parallelism; only terms with
  *     tf > 0 contribute (pinned skip semantics);
  *   - avgdl is an exact integer token total over a single double division.
  *   Ranking ties break on doc_id — total order, engine-independent.
  *
  * Scale shape: one tokenize/aggregate pass builds (doc_id, term, tf,
  * doc_len); the query term list is broadcast (a query workload is
  * human-scale — enforced by `maxQueryTerms`); the only shuffle is the
  * (query_id, doc_id) score aggregation, whose per-group list is bounded
  * by the query's own term count (≤ maxQueryTerms), never by corpus size.
  * Top-k per query is a per-query-partition window over candidate docs —
  * candidates are only docs sharing ≥1 term with the query, and a 100 TB
  * deployment caps hot terms first (the df-cap discipline of
  * [[TextOps.invertedIndex]]).
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75
  private val Ln2 = 0.6931471805599453

  /** Pinned portable natural log (see [[NgramLm.log2Portable]]). */
  def lnPortable(x: Double): Double = NgramLm.log2Portable(x) * Ln2

  /** BM25 idf with the +1 floor (Lucene form — never negative). */
  def idf(n: Long, df: Long): Double =
    lnPortable((n - df + 0.5) / (df + 0.5) + 1.0)

  /** Per-doc term frequencies + doc length over space tokens; null-id /
    * null-text rows dropped (repo null-row convention).
    */
  def termStats(documents: DataFrame): DataFrame = {
    val toks = documents
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("doc_len"))
    tf.join(lens, Seq("doc_id"))
  }

  /** Top-k docs per query. `queries`: (query_id: long, term: string,
    * term_pos: int) — term_pos is the query's own term order and the
    * score's pinned fold order. Emits (query_id, rank, doc_id, score).
    */
  def bm25TopK(
      documents: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      maxQueryTerms: Long = 100000L): DataFrame = {
    require(k > 0)
    val nQueryTerms = queries.count()
    require(nQueryTerms <= maxQueryTerms,
      s"query workload has $nQueryTerms terms > cap $maxQueryTerms — the " +
        "query side is broadcast by contract")

    val stats = CacheRegistry.register(
      termStats(documents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // corpus constants: exact integers, one double division each
    val agg = stats.groupBy(col("doc_id")).agg(first(col("doc_len")).as("len"))
      .agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
      .collect()(0)
    val nDocs = agg.getLong(0)
    if (nDocs == 0L) {
      val spark = documents.sparkSession
      import spark.implicits._
      return spark.emptyDataset[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "doc_id", "score")
    }
    val avgdl = agg.getLong(1).toDouble / nDocs.toDouble

    // df per query term (distinct docs containing it), then the idf scalar
    // evaluated DRIVER-SIDE with the portable log — the query table is
    // broadcast-scale by contract
    val dfByTerm = stats.join(broadcast(queries.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val spark = documents.sparkSession
    import spark.implicits._
    val qTerms = queries.select(col("query_id"), col("term"), col("term_pos"))
      .as[(Long, String, Int)].collect()
    val qWithIdf = qTerms.map { case (qid, term, pos) =>
      (qid, term, pos, idf(nDocs, dfByTerm.getOrElse(term, 0L)))
    }.toSeq.toDF("query_id", "term", "term_pos", "idf")

    val contribs = stats.join(broadcast(qWithIdf), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term_pos"),
        (col("idf") * (col("tf").cast("double") * lit(K1 + 1.0)) /
          (col("tf").cast("double") +
            lit(K1) * (lit(1.0 - B) + lit(B) *
              (col("doc_len").cast("double") / lit(avgdl))))).as("contrib"))
    val scores = contribs.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term_pos"), col("contrib")))),
        lit(0.0),
        (acc: Column, x: Column) => acc + x.getField("contrib")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}

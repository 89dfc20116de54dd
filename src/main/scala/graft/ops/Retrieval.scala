package graft.ops

import org.apache.spark.sql.DataFrame
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
  *     TERM ORDER inside one map task — a pinned addition order, so scores
  *     are bit-identical to the clean-room Python mirror (graftpy.py
  *     bm25_topk) at any parallelism; only terms with tf > 0 contribute
  *     (pinned skip semantics);
  *   - avgdl is an exact integer token total over a single double division.
  *   Ranking ties break on doc_id — total order, engine-independent.
  *
  * Scale shape — broadcast-brute-force scoring (the same contract as the
  * streaming decontamination op's broadcast eval index): the query
  * workload is human-scale BY CONTRACT (hard `maxQueryTerms` cap), so
  * term → idf ships to every task and scoring is three narrow map passes
  * over the corpus (corpus constants, per-term df, per-doc scores) with
  * NO corpus-sized shuffle anywhere — the only shuffled rows are
  * (query_id, doc_id, score) hits, and the per-query top-k window
  * partitions by query. Per-doc cost is O(Σ query terms): for query
  * workloads past the cap, route candidates through
  * [[TextOps.invertedIndex]]'s df-capped postings instead.
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

  /** Top-k docs per query. `queries`: (query_id: long, term: string,
    * term_pos: int) — term_pos is the query's own term order and the
    * score's pinned fold order. Emits (query_id, rank, doc_id, score).
    * Zero-token docs never count toward n or avgdl and never match.
    */
  def bm25TopK(
      documents: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      maxQueryTerms: Long = 100000L): DataFrame = {
    require(k > 0)
    require(maxQueryTerms > 0 && maxQueryTerms < Int.MaxValue,
      s"maxQueryTerms must fit limit()'s Int bound: $maxQueryTerms")
    val spark = documents.sparkSession
    import spark.implicits._

    val docsClean = documents
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"))

    // the broadcast contract, enforced in ONE action: limit(cap+1) bounds
    // the collect REGARDLESS of workload size (an over-cap set never
    // materializes past cap+1 rows), and the length check replaces what a
    // separate count() would learn — which would re-scan the whole query
    // frame (for q_bm25 that frame is a flatMap over the full corpus, so
    // count-then-collect doubled a corpus-sized scan)
    val qTerms = queries.select(col("query_id"), col("term"), col("term_pos"))
      .limit((maxQueryTerms + 1).toInt)
      .as[(Long, String, Int)].collect()
    require(qTerms.length <= maxQueryTerms,
      s"query workload exceeds cap $maxQueryTerms terms — the query side " +
        "is broadcast by contract; use invertedIndex candidates for " +
        "corpus-scale query sets")
    val termSet = qTerms.iterator.map(_._2).toSet
    val bTermSet = spark.sparkContext.broadcast(termSet)

    // corpus constants + per-term df in ONE pass: each tokenized doc
    // emits a null-term length row (counts n / total_len) plus one row
    // per DISTINCT query term present (df). The null group key is
    // STRUCTURAL — never an in-band string a crawled term could collide
    // with.
    val statRows = docsClean.as[(Long, String)]
      .flatMap { case (_, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) Iterator.empty
        else {
          val present = scala.collection.mutable.HashSet.empty[String]
          ws.foreach(w => if (bTermSet.value.contains(w)) present += w)
          Iterator.single((Option.empty[String], ws.length.toLong)) ++
            present.iterator.map(w => (Option(w), 0L))
        }
      }.toDF("term", "len")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("c"), sum(col("len")).as("len_sum"))
      .collect()
    val lenRow = statRows.find(_.isNullAt(0))
    val nDocs = lenRow.map(_.getLong(1)).getOrElse(0L)
    if (nDocs == 0L) {
      return spark.emptyDataset[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "doc_id", "score")
    }
    val avgdl = lenRow.get.getLong(2).toDouble / nDocs.toDouble
    val dfByTerm: Map[String, Long] = statRows.iterator.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // queries with idf attached, terms in term_pos order — the fold order
    val qList: Array[(Long, Array[(String, Double)])] =
      qTerms.groupBy(_._1).iterator.map { case (qid, ts) =>
        (qid, ts.sortBy(_._3).map(t =>
          (t._2, idf(nDocs, dfByTerm.getOrElse(t._2, 0L)))))
      }.toArray
    val bQueries = spark.sparkContext.broadcast(qList)
    val k1p1 = K1 + 1.0
    val oneMinusB = 1.0 - B

    // scoring: one mapPartitions pass; per doc, fold each query's
    // contributions in its term order (pinned IEEE order — the Python
    // mirror's exact loop), then keep only each partition's per-query
    // top-k in bounded heaps (TakeOrdered-per-key): the shuffle to the
    // final window carries ≤ partitions × queries × k rows instead of
    // every (query, candidate) hit. The kept SET is deterministic — top-k
    // under the TOTAL order (score desc, doc_id asc) is arrival-order-
    // independent, and scores are bit-identical per (query, doc).
    val kLocal = k
    val scores = docsClean.as[(Long, String)]
      .mapPartitions { it =>
        // max-heap whose head is the WORST kept candidate (lowest score,
        // then highest doc_id) — O(log k) insert, O(k) memory per query
        val evictOrd: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = java.lang.Double.compare(b._1, a._1)
            if (c != 0) c else java.lang.Long.compare(a._2, b._2)
          }
        }
        val best = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (id, t) =>
          val ws = t.split(" ").filter(_.nonEmpty)
          if (ws.nonEmpty) {
            val tf = scala.collection.mutable.HashMap.empty[String, Long]
            ws.foreach { w =>
              if (bTermSet.value.contains(w)) tf.update(w, tf.getOrElse(w, 0L) + 1L)
            }
            if (tf.nonEmpty) {
              val norm = K1 * (oneMinusB + B * (ws.length.toDouble / avgdl))
              bQueries.value.foreach { case (qid, terms) =>
                var s = 0.0
                var hit = false
                terms.foreach { case (w, idfT) =>
                  val f = tf.getOrElse(w, 0L)
                  if (f != 0L) {
                    hit = true
                    s = s + (idfT * (f.toDouble * k1p1)) / (f.toDouble + norm)
                  }
                }
                if (hit) {
                  val pq = best.getOrElseUpdate(qid,
                    scala.collection.mutable.PriorityQueue.empty(evictOrd))
                  if (pq.size < kLocal) pq.enqueue((s, id))
                  else if (evictOrd.compare((s, id), pq.head) < 0) {
                    pq.dequeue(); pq.enqueue((s, id))
                  }
                }
              }
            }
          }
        }
        best.iterator.flatMap { case (qid, pq) =>
          pq.iterator.map(e => (qid, e._2, e._1))
        }
      }.toDF("query_id", "doc_id", "score")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}

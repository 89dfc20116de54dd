package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterated BPE tokenizer training (Sennrich et al. 2016 §3): K rounds of
  * "count adjacent symbol pairs over the word-frequency table, merge the
  * argmax everywhere", producing the ordered merge table a tokenizer ships
  * with. [[TextOps.bpePairCounts]] is one round's COUNT half; this runs the
  * whole loop.
  *
  * Scale shape per round: ONE shuffle (the pair-count aggregate, weighted
  * by word freq, partial-combining map-side) + a TakeOrdered(1) argmax —
  * driver traffic is a single row per round, never a table. The state
  * (distinct words as symbol arrays × freq) is Heaps'-law small relative
  * to the corpus and is re-segmented map-side by the merge UDF. Each
  * round's state is EAGERLY localCheckpoint'ed/checkpoint'ed (same lineage
  * discipline as [[Dedup.nearDupClusters]]): without truncation, round k's
  * count job would recompute all k-1 prior merge UDFs from the raw corpus
  * — O(K²) total work — and the plan would grow without bound.
  *
  * Determinism: argmax ties break (count DESC, left ASC, right ASC) —
  * binary string order, identical in the Python golden for ASCII and
  * pinned by test. Merge application is the standard left-to-right
  * non-overlapping scan ("aaa" under (a,a) → ["aa","a"]).
  *
  * Output: (merge_rank, left, right, merged, pair_count) — one row per
  * merge, in training order. Stops early if no pair remains.
  */
object Bpe {

  /** Left-to-right non-overlapping application of one merge. */
  private[graft] def applyMerge(
      syms: Seq[String], l: String, r: String): Seq[String] = {
    if (syms == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** BPE ENCODE — the consumer half of [[train]]: segment every document
    * with a trained merge list and report per-document piece counts (the
    * number that sizes training batches once a tokenizer exists).
    *
    * Semantics PINNED to training: merges apply sequentially in rank
    * order, each fully (left-to-right non-overlapping) — so encoding a
    * training word reproduces the trainer's final segmentation exactly
    * (internal consistency the Python golden asserts). This is the
    * reference algorithm, O(K·len) per word; a production encoder for
    * K≈50k merges would use the rank-priority formulation with a pair
    * index — same output for the merge lists train() produces, different
    * constant factor. The merge list is a broadcast (K rows — tiny);
    * encoding is pure map-side, no shuffle. Null doc_ids are rejected up
    * front (same convention as shardAssign/greedyPack/packIndex): the
    * counts feed accounting pipelines — packIndexFromCounts downstream —
    * where a null key's position has no portable meaning.
    */
  def encodeCounts(
      documents: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val bc = documents.sparkSession.sparkContext.broadcast(merges.toArray)
    val enc = udf(new (String => Long) with Serializable {
      // per-deserialization (≈ per-task) LRU memo, word → piece count:
      // encode is a pure function of the word and web text is Zipf —
      // the hot vocabulary hits the memo, the long tail is bounded by
      // the eviction cap (same discipline as the syllabify memo; an
      // unbounded map would be an adversarial-vocab OOM)
      @transient private lazy val memo =
        new java.util.LinkedHashMap[String, java.lang.Long](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, java.lang.Long]): Boolean = size > 65536
        }
      private def pieces(w: String): Long = {
        val hit = memo.get(w)
        if (hit != null) return hit.longValue()
        // split by CODE POINT, not UTF-16 code unit: train()'s regex
        // split("") is code-point aware, so a supplementary-plane char
        // is one trainable symbol — `w.map(_.toString)` would shear it
        // into surrogate halves no merge can ever match
        var syms: Seq[String] = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toSeq
        var i = 0
        val ms = bc.value
        while (i < ms.length) {
          syms = applyMerge(syms, ms(i)._1, ms(i)._2)
          i += 1
        }
        val n = syms.length.toLong
        memo.put(w, n)
        n
      }
      def apply(text: String): Long = {
        if (text == null) 0L
        else {
          var total = 0L
          text.split(" ").foreach { w => if (w.nonEmpty) total += pieces(w) }
          total
        }
      }
    })
    documents.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), enc(col("text")).as("n_pieces"))
  }

  def train(documents: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    val spark = documents.sparkSession

    val wordFreq = TextOps.wordFreq(documents)
      .select(col("freq"),
        filter(split(col("word"), ""), c => c =!= lit("")).as("syms"))
    // size the loop state's partitioning to the VOCAB, not the session
    // default: the state is Heaps'-law small (often thousands of rows under
    // a 32+-partition session default), and every one of the K rounds pays
    // per-partition job overhead on it — ~100k words/partition, capped at
    // the session parallelism for genuinely huge vocabularies. ONE
    // materialization: persist feeds the count AND the repartition that is
    // then checkpointed (an initial checkpoint just to count would
    // materialize the same table twice)
    val wf = CacheRegistry.register(wordFreq
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      wf.count() / 100000L + 1L)).toInt
    // tracked truncation: each round deletes the superseded round's
    // reliable-checkpoint files once its successor materializes (Lineage
    // scaladoc) — K rounds of dead state must not accumulate on disk
    var (syms, symsFiles) = Lineage.truncateTracked(wf.repartition(parts))
    wf.unpersist()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      // one partial-combining shuffle; argmax is TakeOrdered(1) — the only
      // driver traffic of the round is this single row
      val top = syms.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(k, l, r, l + r, cnt)
        // the final round's state has no consumer — skip the re-segment +
        // checkpoint job (1/K of the loop's state work) when k == numMerges
        if (k < numMerges) {
          val mergeUdf = udf((s: Seq[String]) => applyMerge(s, l, r))
          val superseded = syms
          val supersededFiles = symsFiles
          val (next, nextFiles) =
            Lineage.truncateTracked(syms.select(col("freq"), mergeUdf(col("syms")).as("syms")))
          syms = next
          symsFiles = nextFiles
          superseded.unpersist()
          Lineage.deleteCheckpointFiles(superseded, supersededFiles)
        }
        k += 1
      }
    }
    syms.unpersist()
    Lineage.deleteCheckpointFiles(syms, symsFiles)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }
}

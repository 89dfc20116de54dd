package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023),
  * the hashed-n-gram data-selection step modern pretraining pipelines run
  * between dedup and tokenization: score every raw document by how much
  * its hashed unigram+bigram distribution looks like a TARGET corpus
  * (here: a trusted high-quality slice), then Gumbel-top-k resample.
  *
  * Pinned spec (mirrored clean-room as `ds_*` in graftpy.py):
  *   - features of a doc: whitespace tokens in order (unigrams), then
  *     adjacent pairs in order joined by one space (bigrams) — tokens
  *     cannot contain spaces, so the joined form is collision-free.
  *   - bucket = low 13 bits of the md5-head hash (m = 8192 — a POWER OF
  *     TWO, so signed-Long masking and Python unsigned arithmetic agree;
  *     a modulus would diverge on negative hashes).
  *   - add-1-smoothed bucket log-ratio, portable ln, double divisions
  *     pinned as (cnt+1) / (total+m):
  *       logratio[b] = ln((ct[b]+1)/(tt+m)) − ln((cr[b]+1)/(tr+m))
  *   - log_weight(doc) = Σ logratio[bucket(f)] over features in order.
  *   - gumbel(doc) = −ln(−ln(u)), u = ((h >>> 11) + 0.5)·2⁻⁵³ from the
  *     md5-head of "dsir|<doc_id>" — the Gumbel-top-k trick with pinned
  *     pseudo-randomness, so "sampling" is reproducible and
  *     oracle-checkable.
  *   - selected = the k largest (score = log_weight + gumbel) with ties
  *     on doc_id ASC.
  *
  * 100 TB shape: the bucket table is ONE pass (explode → 8192-row
  * aggregate, partial map-side combine) collected bounded-by-construction
  * (m rows); scoring is map-only against the broadcast ratio array; the
  * top-k is TakeOrderedAndProject (per-partition heaps, driver merges k),
  * never a full sort. Document text never shuffles.
  */
object Dsir {

  val NumBuckets: Int = 8192 // power of two — see bucket pinning above

  private[ops] def bucketOf(feature: String): Int =
    (Centrality.hash64(feature) & (NumBuckets - 1)).toInt

  /** Feature buckets of a doc: unigrams in token order, then bigrams. */
  private[ops] def featureBuckets(text: String): Array[Int] = {
    if (text == null) return Array.empty
    val toks = text.split(" ").filter(_.nonEmpty)
    val out = new Array[Int](if (toks.length == 0) 0 else 2 * toks.length - 1)
    var i = 0
    while (i < toks.length) { out(i) = bucketOf(toks(i)); i += 1 }
    var j = 0
    while (j + 1 < toks.length) {
      out(toks.length + j) = bucketOf(toks(j) + " " + toks(j + 1))
      j += 1
    }
    out
  }

  private[ops] def gumbelOf(docId: Long): Double = {
    val h = Centrality.hash64("dsir|" + docId)
    val u = ((h >>> 11).toDouble + 0.5) * Math.scalb(1.0, -53)
    -Retrieval.lnPortable(-Retrieval.lnPortable(u))
  }

  /** Score + select: `documents` must carry (doc_id, text) and
    * `targetCol` a boolean marking the trusted slice. Returns every doc
    * with (log_weight, gumbel, score, selected).
    */
  def select(
      documents: DataFrame,
      targetCol: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k >= 1, s"dsir: k must be positive, got $k")
    val spark = documents.sparkSession
    import spark.implicits._
    val bucketsUdf = udf((t: String) => featureBuckets(t))

    // coalesce: a NULL target predicate (e.g. lang IS NULL under
    // `lang === "en"`) must mean "not target", not a non-nullable-field
    // crash in the typed scoring pass below
    val base = documents.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("text"),
        coalesce(targetCol, lit(false)).as("__is_target"))

    // ONE bucket-count pass for both distributions; ≤ m rows collected
    // (bounded by construction)
    val counts = base
      .select(explode(bucketsUdf(col("text"))).as("bucket"), col("__is_target"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__is_target"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .collect()
    val targetCnt = new Array[Long](NumBuckets)
    val rawCnt = new Array[Long](NumBuckets)
    var tt = 0L
    var tr = 0L
    counts.foreach { r =>
      val b = r.getInt(0)
      targetCnt(b) = r.getLong(1)
      rawCnt(b) = r.getLong(2)
      tt += r.getLong(1)
      tr += r.getLong(2)
    }
    val m = NumBuckets
    val ratio = new Array[Double](m)
    var b = 0
    while (b < m) {
      ratio(b) =
        Retrieval.lnPortable((targetCnt(b) + 1L).toDouble / (tt + m).toDouble) -
          Retrieval.lnPortable((rawCnt(b) + 1L).toDouble / (tr + m).toDouble)
      b += 1
    }
    val ratioB = spark.sparkContext.broadcast(ratio)

    val scored = base.as[(Long, String, Boolean)]
      .map { case (id, text, _) =>
        val r = ratioB.value
        var w = 0.0
        featureBuckets(text).foreach(bk => w += r(bk)) // feature-order fold
        val g = gumbelOf(id)
        (id, w, g, w + g)
      }
      .toDF("doc_id", "log_weight", "gumbel", "score")
    val scoredP = CacheRegistry.register(
      scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // exact top-k: per-partition heaps + driver merge of k ids
    // (TakeOrderedAndProject), then a broadcast membership gate
    val topIds = scoredP.orderBy(col("score").desc, col("doc_id").asc)
      .limit(k).select(col("doc_id")).as[Long].collect().toSet
    val idsB = spark.sparkContext.broadcast(topIds)
    val selUdf = udf((id: Long) => idsB.value.contains(id))
    scoredP.withColumn("selected", selUdf(col("doc_id")))
  }

  /** Per-shard distribution drift — KL(shard ‖ corpus) over the same
    * hashed feature buckets: the data-quality monitor a sharded corpus
    * runs to catch a shard whose token distribution silently diverged
    * (bad extraction batch, mis-routed language, duplicated source).
    * Smoothing and fold order pinned like [[select]]:
    *
    *   p_b = (c_sb + 1)/(tot_s + m),  q_b = (c_b + 1)/(tot + m),
    *   kl = Σ_b p_b · ln(p_b / q_b)   (bucket-index order, portable ln)
    *
    * Shape: ONE explode → (shard, bucket) aggregate (map-side combined);
    * the collect is bounded by the ENFORCED maxShards cap (≤
    * maxShards·m rows); the KL folds are driver-side over the collected
    * count table. Document text never shuffles.
    */
  def divergence(
      documents: DataFrame,
      shardCol: org.apache.spark.sql.Column,
      maxShards: Int = 64): DataFrame = {
    require(maxShards >= 1, s"divergence: maxShards must be positive")
    val spark = documents.sparkSession
    import spark.implicits._
    val bucketsUdf = udf((t: String) => featureBuckets(t))
    val m = NumBuckets

    // a NULL shard key is a real shard (pinned as the empty string —
    // matching the mirror; an unguarded null would NPE the driver sort)
    val shardKey = coalesce(shardCol.cast("string"), lit("")).as("__shard")
    // cap probe FIRST, on the column-pruned distinct-shard projection —
    // a limit on the grouped counts could silently truncate a shard's
    // buckets and pass the cap check with incomplete data. The probe is
    // also the OUTPUT row set: a shard whose documents yield zero
    // feature buckets still gets a row (explode drops it from counts,
    // but a feature-less shard is exactly what the monitor must flag)
    val probe = documents.select(shardKey)
      .distinct().limit(maxShards + 1).as[String].collect()
    require(probe.length <= maxShards,
      s"divergence: > $maxShards shards — raise maxShards or pre-bucket " +
        "the shard key")
    val counts = documents
      .select(shardKey, explode(bucketsUdf(col("text"))).as("bucket"))
      .groupBy(col("__shard"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Int, Long)].collect() // ≤ maxShards·m rows (probed)

    val grouped = counts.groupBy(_._1)
    val perShard = probe.sorted.toSeq.map { s =>
      val arr = new Array[Long](m)
      val rows = grouped.getOrElse(s, Array.empty[(String, Int, Long)])
      rows.foreach { case (_, b, c) => arr(b) = c }
      (s, arr, rows.iterator.map(_._3).sum)
    }
    val corpus = new Array[Long](m)
    perShard.foreach { case (_, arr, _) =>
      var b = 0
      while (b < m) { corpus(b) += arr(b); b += 1 }
    }
    val tot = corpus.sum

    val rows = perShard.map { case (s, arr, totS) =>
      var kl = 0.0
      var b = 0
      while (b < m) {
        val p = (arr(b) + 1L).toDouble / (totS + m).toDouble
        val q = (corpus(b) + 1L).toDouble / (tot + m).toDouble
        kl += p * Retrieval.lnPortable(p / q)
        b += 1
      }
      (s, totS, kl)
    }
    rows.toDF("shard", "n_features", "kl_nats")
  }
}

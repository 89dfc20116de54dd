package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier selection — the step between link-graph extraction and
  * the next fetch wave: from the edges of the already-crawled wave, pick
  * the targets worth fetching next, subject to robots and a per-host
  * politeness budget. Composes three existing families on their public
  * contracts: [[LinkGraph.edges]] (candidates), [[Robots.annotate]]
  * (the politeness gate), and the two-phase salted top-k discipline
  * ([[Sampling.sampleKPerGroup]]'s shape) for the per-host budget.
  */
object Frontier {

  /** Next-wave fetch candidates.
    *
    *   - candidates = distinct `dst` of edges whose `src` is in `crawled`,
    *     minus `crawled` itself (semi-join + anti-join on url — digests of
    *     the crawl state, never page payloads);
    *   - score = `refs` = count of DISTINCT referring crawled pages (one
    *     partial-aggregating shuffle on dst);
    *   - gate = robots decision for `agent` (missing robots row → allowed,
    *     the RFC default);
    *   - budget = top-`b(host)` per host by (refs DESC, url ASC) — a
    *     pinned total order — via the two-phase salted top-k: rank within
    *     (host, salt) first, then rank the ≤ k·saltBuckets survivors
    *     within host, so a hot host (half the frontier on one CDN) never
    *     sorts in a single task. Result equals the single-window form
    *     exactly (top-k of a union of per-salt top-k IS the global top-k
    *     under one total order);
    *   - when `crawlWindowSec > 0`, a host that published a crawl-delay
    *     shrinks its budget to the fetches that fit the window:
    *     `b = min(k, max(1, floor(crawlWindowSec / crawl_delay)))` —
    *     ignoring crawl-delay in the frontier would be impolite at fetch
    *     time. Null or non-positive delay (none published, unparseable, or
    *     `0`) keeps `b = k`. Default `crawlWindowSec = 0` disables the
    *     modifier. `b ≤ k` always, so the phase-1 per-salt `k` cap stays
    *     exact.
    *
    * Output: (url, host, refs, rnk), rnk in 1..b(host) per host.
    */
  def nextWave(
      edges: DataFrame,
      crawled: DataFrame,
      robots: DataFrame,
      agent: String,
      k: Int,
      saltBuckets: Int = 16,
      crawlWindowSec: Double = 0.0): DataFrame =
    waveCore(edges, crawled, robots, agent, k, saltBuckets,
      crawlWindowSec, ranks = None)

  /** The shared frontier machinery (ONE copy — review r6): uncrawled
    * candidates with referral counts, optional priority join, robots
    * gate, crawl-delay budget, and the two-phase salted per-host top-k
    * ordered by `priority DESC, url` where priority is `refs` (plain
    * wave) or the joined `rank` (ranked wave).
    */
  private def waveCore(
      edges: DataFrame,
      crawled: DataFrame,
      robots: DataFrame,
      agent: String,
      k: Int,
      saltBuckets: Int,
      crawlWindowSec: Double,
      ranks: Option[DataFrame]): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(saltBuckets > 0, s"saltBuckets must be positive: $saltBuckets")
    val crawledUrls = crawled.select(col("url")).filter(col("url").isNotNull)
    val cand0 = edges
      .join(crawledUrls.withColumnRenamed("url", "__cs"),
        edges("src") === col("__cs"), "left_semi")
      .join(crawledUrls.withColumnRenamed("url", "__cd"),
        edges("dst") === col("__cd"), "left_anti")
      .groupBy(col("dst").as("url"))
      .agg(countDistinct(col("src")).as("refs"))
    val cand = ranks match {
      case None => cand0
      case Some(r) => cand0
        .join(r.select(col("url"), col("rank"))
          .filter(col("url").isNotNull), Seq("url"), "left")
        .na.fill(0.0, Seq("rank"))
    }
    val prio = if (ranks.isEmpty) col("refs") else col("rank")
    val outCols =
      if (ranks.isEmpty)
        Seq(col("url"), col("host"), col("refs"), col("rnk"))
      else
        Seq(col("url"), col("host"), col("rank"), col("refs"), col("rnk"))

    val allowed = Robots.annotate(cand, robots, agent)
      .filter(col("allowed"))

    // per-host budget (a column, not a collect — hosts never hit the
    // driver); floor() of an IEEE division, pinned in the DuckDB oracle
    // as the same literal expression
    val budget =
      if (crawlWindowSec <= 0.0) lit(k)
      else when(col("crawl_delay").isNull || col("crawl_delay") <= 0.0, lit(k))
        .otherwise(least(lit(k.toLong),
          greatest(lit(1L), floor(lit(crawlWindowSec) / col("crawl_delay")))))

    val w = Window
    val local = allowed
      .withColumn("__salt", pmod(xxhash64(col("url")), lit(saltBuckets.toLong)))
      .withColumn("__lr", row_number().over(
        w.partitionBy(col("host"), col("__salt"))
          .orderBy(prio.desc, col("url"))))
      .filter(col("__lr") <= k)
    local
      .withColumn("rnk", row_number().over(
        w.partitionBy(col("host")).orderBy(prio.desc, col("url"))))
      .filter(col("rnk") <= budget)
      .select(outCols: _*)
  }

  /** [[nextWave]] with an external PRIORITY table (url, rank — e.g.
    * [[LinkGraph.pagerank]]'s output): candidates rank per host by
    * (rank DESC, url) instead of referral count — the crawl-ordering
    * policy real crawlers run (OPIC/PageRank-guided frontiers).
    * Candidates left-join the rank table on the url key (absent urls
    * take 0.0); everything else — robots gate, crawl-delay budget,
    * two-phase salted per-host top-k — is the same machinery. Output:
    * (url, host, rank, refs, rnk).
    */
  def nextWaveRanked(
      edges: DataFrame,
      crawled: DataFrame,
      robots: DataFrame,
      agent: String,
      k: Int,
      ranks: DataFrame,
      saltBuckets: Int = 16,
      crawlWindowSec: Double = 0.0): DataFrame =
    waveCore(edges, crawled, robots, agent, k, saltBuckets,
      crawlWindowSec, ranks = Some(ranks))

  /** Politeness scheduler: turn a wave ([[nextWave]]'s (url, host, refs,
    * rnk) shape) into per-url fetch offsets — the rnk-th fetch of a host
    * waits (rnk−1) × that host's crawl-delay ([[Robots.hostMeta]]'s
    * selected value; absent or non-positive delays take `defaultDelay`).
    * Pure relational: one broadcast join against the per-host metadata
    * (hosts ≪ urls by construction) and a map-side multiply — the wave
    * never re-shuffles, so the op is free at any scale. scheduled_at is
    * an offset in seconds from the wave start; the caller adds its own
    * epoch.
    */
  def schedule(
      wave: DataFrame,
      hostMeta: DataFrame,
      defaultDelay: Double = 1.0): DataFrame = {
    require(defaultDelay > 0.0, s"defaultDelay must be positive: $defaultDelay")
    val meta = hostMeta.select(col("host"), col("crawl_delay"))
      .filter(col("host").isNotNull)
    wave.join(broadcast(meta), Seq("host"), "left")
      .withColumn("delay_s",
        when(col("crawl_delay").isNotNull && col("crawl_delay") > 0.0,
          col("crawl_delay")).otherwise(lit(defaultDelay)))
      .withColumn("scheduled_at", (col("rnk") - 1) * col("delay_s"))
      .select(col("url"), col("host"), col("refs"), col("rnk"),
        col("delay_s"), col("scheduled_at"))
  }
}

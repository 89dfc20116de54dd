package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots-exclusion evaluation (RFC 9309 / Google REP semantics) — the
  * politeness gate every crawl-derived corpus applies before a URL is
  * fetched or kept. A 100 TB pipeline evaluates it twice: once in the
  * frontier (don't fetch) and once in curation (drop pages whose robots
  * changed since capture).
  *
  * PINNED spec (mirrored clean-room in tools/oracle/graftpy.py rb_*):
  *
  * Parsing ([[parseRules]]):
  *   - lines split on '\n', trailing '\r' stripped; text from the first
  *     '#' to end-of-line is comment; directives are `name: value` with
  *     the name ASCII-case-insensitive and both sides trimmed;
  *   - consecutive `user-agent` lines open ONE group (RFC 9309 §2.1);
  *     the first `allow`/`disallow` line closes the agent run and rules
  *     append to that group; rules before any group are ignored; unknown
  *     directives (crawl-delay, sitemap, host…) are ignored and do NOT
  *     close an agent run; empty-value allow/disallow rules are dropped
  *     (an empty Disallow means "allow all" — it matches nothing);
  *   - group selection for product token `agent`: a group token `t`
  *     matches with specificity `t.length` when lowercase(agent) starts
  *     with lowercase(t); `*` matches with specificity 0. The rules of
  *     ALL groups at the maximal matching specificity concatenate (RFC:
  *     groups with the same token merge); no group at all → allow-all.
  *
  * Matching ([[decide]]):
  *   - a rule pattern matches a path-and-query when the glob (pattern,
  *     with `*` = any run of characters, `$` as final char = end anchor,
  *     implicitly suffixed with `*` when not anchored) matches the whole
  *     path string starting at position 0; octets compare literally (no
  *     percent-decoding — the documented simplification, both engines);
  *   - the winning rule is the matching rule with the LONGEST pattern;
  *     at equal length `allow` wins (Google tie-break); no matching rule
  *     → allowed. The default (no robots row at all) is allowed.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Glob match anchored at BOTH ends: '*' = any char run; the caller
    * appends '*' for prefix semantics. Classic two-pointer backtracking
    * scan — linear in practice, never throws.
    */
  private[ops] def globMatch(pat: String, s: String): Boolean = {
    var pi = 0
    var si = 0
    var star = -1
    var mark = 0
    while (si < s.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        star = pi; pi += 1; mark = si
      } else if (pi < pat.length && pat.charAt(pi) == s.charAt(si)) {
        pi += 1; si += 1
      } else if (star >= 0) {
        mark += 1; si = mark; pi = star + 1
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** One rule-pattern match per the pinned spec ('$' end anchor, implicit
    * trailing '*' otherwise).
    */
  private[ops] def patternMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    if (pattern.charAt(pattern.length - 1) == '$')
      globMatch(pattern.substring(0, pattern.length - 1), path)
    else globMatch(pattern + "*", path)
  }

  /** Parse one robots.txt body and select the rule list for `agent`. */
  def parseRules(body: String, agent: String): IndexedSeq[Rule] = {
    if (body == null) return IndexedSeq.empty
    val agentLc = LinkGraph.asciiLower(agent)
    // groups: (agent tokens, rules)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[Rule])]
    var inUaRun = false
    body.split("\n", -1).foreach { raw0 =>
      val noCr =
        if (raw0.nonEmpty && raw0.charAt(raw0.length - 1) == '\r')
          raw0.substring(0, raw0.length - 1)
        else raw0
      val hash = noCr.indexOf('#')
      val line = if (hash < 0) noCr else noCr.substring(0, hash)
      val colon = line.indexOf(':')
      if (colon >= 0) {
        val name = LinkGraph.asciiLower(line.substring(0, colon).trim)
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!inUaRun) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
              inUaRun = true
            }
            if (value.nonEmpty)
              groups.last._1 += LinkGraph.asciiLower(value)
          case "allow" | "disallow" =>
            inUaRun = false
            if (value.nonEmpty && groups.nonEmpty)
              groups.last._2 += Rule(name == "allow", value)
          case _ => () // unknown directive: ignored, does not close the run
        }
      }
      // non-directive lines (blank, comment-only) are ignored entirely
    }
    // specificity per group = max over its tokens
    def spec(tokens: Seq[String]): Int = {
      var best = -1
      tokens.foreach { t =>
        if (t == "*") best = math.max(best, 0)
        else if (agentLc.startsWith(t)) best = math.max(best, t.length)
      }
      best
    }
    val specs = groups.map(g => spec(g._1.toSeq))
    val top = if (specs.isEmpty) -1 else specs.max
    if (top < 0) IndexedSeq.empty
    else groups.iterator.zip(specs.iterator)
      .filter(_._2 == top).flatMap(_._1._2).toIndexedSeq
  }

  /** Longest-match decision: (allowed, winning pattern or null). */
  def decide(rules: Seq[Rule], path: String): (Boolean, String) = {
    var bestLen = -1
    var bestAllow = true
    var bestPat: String = null
    rules.foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow; bestPat = r.pattern
        }
      }
    }
    if (bestLen < 0) (true, null) else (bestAllow, bestPat)
  }

  /** path-and-query of an absolute http(s) url ("/" when absent). */
  private[ops] def pathOf(url: String): String = {
    val sep = url.indexOf("://")
    if (sep < 0) return url
    val rest = url.substring(sep + 3)
    val slash = rest.indexOf('/')
    if (slash < 0) "/" else rest.substring(slash)
  }

  private def hostCol(c: Column): Column =
    substring_index(substring_index(c, "://", -1), "/", 1)

  /** Annotate a url table with the robots decision for `agent`.
    *
    * `robots` is (host, robots_txt) — ONE row per host. Bodies parse
    * map-side into the selected rule list BEFORE the join, so robots.txt
    * text never re-parses per url and never shuffles more than once.
    *
    * Scale shape: a url-side hot host (half the crawl is one CDN host)
    * would put every one of its urls in one reducer of a plain host join.
    * `saltBuckets` replicates each (tiny, bounded) parsed-rules row
    * `saltBuckets` times and keys the url side by
    * (host, xxhash64(url) % saltBuckets) — the standard replicated-
    * build-side salt, exact by construction. Urls whose host has no
    * robots row are allowed with a null rule (RFC default).
    *
    * The decision itself is a scala lambda over (rules, path) — a
    * genuinely non-expression kernel with bounded input (rule lists are
    * human-authored), per the repo UDF policy.
    */
  def annotate(
      urls: DataFrame,
      robots: DataFrame,
      agent: String,
      saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive: $saltBuckets")
    // the op ADDS host/allowed/rule — a caller's own column of one of
    // those names would be silently clobbered and then duplicated in the
    // output (AMBIGUOUS_REFERENCE downstream); fail loudly instead
    Seq("host", "allowed", "rule").foreach { c =>
      require(!urls.columns.contains(c),
        s"annotate adds a '$c' column — rename the input's '$c' first")
    }
    val spark = urls.sparkSession
    import spark.implicits._

    val parsed = robots
      .filter(col("host").isNotNull && col("robots_txt").isNotNull)
      .select(col("host"), col("robots_txt")).as[(String, String)]
      .flatMap { case (h, body) =>
        val rules = parseRules(body, agent)
        (0 until saltBuckets).iterator.map { salt =>
          (h, salt, rules.map(r => (r.allow, r.pattern)))
        }
      }
      .toDF("__rhost", "__rsalt", "__rules")

    val keyed = urls
      .filter(col("url").isNotNull)
      .withColumn("host", hostCol(col("url")))
      .withColumn("__usalt",
        pmod(xxhash64(col("url")), lit(saltBuckets.toLong)).cast("int"))

    val decideUdf = udf { (rules: Seq[org.apache.spark.sql.Row], url: String) =>
      val rs =
        if (rules == null) Seq.empty[Rule]
        else rules.map(r => Rule(r.getBoolean(0), r.getString(1)))
      val (allowed, pat) = decide(rs, pathOf(url))
      (allowed, pat)
    }

    val outCols = urls.columns.map(col).toSeq :+ col("host")
    keyed
      .join(parsed,
        keyed("host") === col("__rhost") && col("__usalt") === col("__rsalt"),
        "left")
      .withColumn("__d", decideUdf(col("__rules"), col("url")))
      .select(outCols :+
        col("__d._1").as("allowed") :+ col("__d._2").as("rule"): _*)
  }
}

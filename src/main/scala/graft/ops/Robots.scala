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
  *     directives (host…) are ignored and do NOT close an agent run;
  *     empty-value allow/disallow rules are dropped (an empty Disallow
  *     means "allow all" — it matches nothing);
  *   - `crawl-delay` (the Bing/Yandex politeness extension) attaches to
  *     the CURRENT group like a rule but — matching its previous
  *     ignored-directive treatment — neither opens nor closes an agent
  *     run; the value must be a plain non-negative decimal
  *     (`[0-9]+(\.[0-9]+)?` after trim) or the line is ignored. The
  *     selected delay is the FIRST delay in the selected groups'
  *     concatenation order (same merge as rules); none → absent;
  *   - `sitemap` is document-global (RFC 9309 §2.3 "other records"):
  *     non-empty values collect in document order, first-occurrence
  *     deduplicated, independent of any group;
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

  private final class Group {
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val delays = scala.collection.mutable.ArrayBuffer.empty[Double]
  }

  private val DelayValue = "[0-9]+(\\.[0-9]+)?".r

  /** Parse one body into its groups plus the document-global sitemap list
    * (first-occurrence deduplicated, document order).
    */
  private def parseBody(body: String)
      : (IndexedSeq[Group], IndexedSeq[String]) = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.LinkedHashSet.empty[String]
    if (body == null) return (IndexedSeq.empty, IndexedSeq.empty)
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
            if (!inUaRun) { groups += new Group; inUaRun = true }
            if (value.nonEmpty)
              groups.last.tokens += LinkGraph.asciiLower(value)
          case "allow" | "disallow" =>
            inUaRun = false
            if (value.nonEmpty && groups.nonEmpty)
              groups.last.rules += Rule(name == "allow", value)
          case "crawl-delay" =>
            // attaches to the current group; like its previous unknown-
            // directive treatment it does NOT close the agent run
            if (groups.nonEmpty && DelayValue.pattern.matcher(value).matches())
              groups.last.delays += value.toDouble
          case "sitemap" =>
            // reject values with embedded whitespace/control bytes (trim
            // only strips the ends): a url is whitespace-free, and
            // hostMeta's space-joined `sitemaps` contract depends on it —
            // ASCII-pinned (c <= 0x20) to match the Python mirror
            if (value.nonEmpty && !value.exists(_ <= ' ')) sitemaps += value
          case _ => () // unknown directive: ignored, does not close the run
        }
      }
      // non-directive lines (blank, comment-only) are ignored entirely
    }
    (groups.toIndexedSeq, sitemaps.toIndexedSeq)
  }

  /** Indices of the groups selected for `agent` (maximal matching
    * specificity; RFC: same-token groups merge), or empty when none match.
    */
  private def selectGroups(groups: IndexedSeq[Group], agent: String): IndexedSeq[Int] = {
    val agentLc = LinkGraph.asciiLower(agent)
    // specificity per group = max over its tokens
    def spec(tokens: Seq[String]): Int = {
      var best = -1
      tokens.foreach { t =>
        if (t == "*") best = math.max(best, 0)
        else if (agentLc.startsWith(t)) best = math.max(best, t.length)
      }
      best
    }
    val specs = groups.map(g => spec(g.tokens.toSeq))
    val top = if (specs.isEmpty) -1 else specs.max
    if (top < 0) IndexedSeq.empty
    else groups.indices.filter(i => specs(i) == top)
  }

  /** Parse one robots.txt body and select the rule list for `agent`. */
  def parseRules(body: String, agent: String): IndexedSeq[Rule] = {
    val (groups, _) = parseBody(body)
    selectGroups(groups, agent).flatMap(i => groups(i).rules)
  }

  /** Selected rules plus the selected crawl-delay (first delay in the
    * selected groups' concatenation order) and the document's sitemaps.
    */
  def parseAgent(body: String, agent: String)
      : (IndexedSeq[Rule], Option[Double], IndexedSeq[String]) = {
    val (groups, sitemaps) = parseBody(body)
    val sel = selectGroups(groups, agent)
    val rules = sel.flatMap(i => groups(i).rules)
    val delay = sel.iterator.flatMap(i => groups(i).delays.iterator)
      .take(1).toList.headOption
    (rules, delay, sitemaps)
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

  /** Host with FIRST-occurrence "://" semantics, '' when the url has no
    * scheme separator — exactly [[LinkGraph.hostOf]] / the mirror's
    * rb_host_of. NOT substring_index(c, "://", -1): that splits on the
    * LAST occurrence, so a url whose query embeds an absolute url
    * ("/redirect?u=https://evil.com/p" — passed through untouched by
    * LinkGraph.resolve) would key to the EMBEDDED host, miss its robots
    * row, and default to allowed — silently bypassing the politeness gate
    * (ADVICE r5). Pure expression: instr is the first occurrence.
    */
  private def hostCol(c: Column): Column = {
    val pos = instr(c, "://")
    when(pos === 0, lit(""))
      .otherwise(substring_index(
        c.substr(pos + lit(3), lit(Int.MaxValue)), "/", 1))
  }

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
    * robots row are allowed with a null rule and null crawl_delay (RFC
    * default); output adds (host, allowed, rule, crawl_delay).
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
    Seq("host", "allowed", "rule", "crawl_delay").foreach { c =>
      require(!urls.columns.contains(c),
        s"annotate adds a '$c' column — rename the input's '$c' first")
    }
    val spark = urls.sparkSession
    import spark.implicits._

    val parsed = robots
      .filter(col("host").isNotNull && col("robots_txt").isNotNull)
      .select(col("host"), col("robots_txt")).as[(String, String)]
      .flatMap { case (h, body) =>
        val (rules, delay, _) = parseAgent(body, agent)
        (0 until saltBuckets).iterator.map { salt =>
          (h, salt, rules.map(r => (r.allow, r.pattern)), delay)
        }
      }
      .toDF("__rhost", "__rsalt", "__rules", "__delay")

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
        col("__d._1").as("allowed") :+ col("__d._2").as("rule") :+
        col("__delay").as("crawl_delay"): _*)
  }

  /** Per-host robots metadata for `agent`: the selected crawl-delay and
    * the document's sitemap list — (host, crawl_delay, n_sitemaps,
    * sitemaps). Map-only (one parse per host row). `sitemaps` joins with a
    * single space (a url cannot contain a literal space — it would be
    * percent-encoded), first-occurrence order; empty list → ''.
    */
  def hostMeta(robots: DataFrame, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots
      .filter(col("host").isNotNull && col("robots_txt").isNotNull)
      .select(col("host"), col("robots_txt")).as[(String, String)]
      .map { case (h, body) =>
        val (_, delay, sitemaps) = parseAgent(body, agent)
        (h, delay, sitemaps.length, sitemaps.mkString(" "))
      }
      .toDF("host", "crawl_delay", "n_sitemaps", "sitemaps")
  }
}

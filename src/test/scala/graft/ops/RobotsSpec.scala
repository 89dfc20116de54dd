package graft.ops

import graft.pipeline.RobotsGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  import Robots.Rule

  // ---- glob matcher ----

  test("globMatch: literal, star runs, anchored both ends") {
    assert(Robots.globMatch("/a/b", "/a/b"))
    assert(!Robots.globMatch("/a/b", "/a/bc")) // anchored: no implicit tail
    assert(Robots.globMatch("/a*", "/a/very/deep"))
    assert(Robots.globMatch("/*/d/*.html", "/sec1/d/doc7.html"))
    assert(Robots.globMatch("*", ""))
    assert(Robots.globMatch("**a*", "cba"))
    assert(!Robots.globMatch("/a*x", "/aby"))
  }

  test("patternMatches: prefix semantics unless $-anchored") {
    assert(Robots.patternMatches("/sec1/", "/sec1/d/doc.html"))
    assert(!Robots.patternMatches("/sec1/", "/sec2/d/doc.html"))
    assert(Robots.patternMatches("/*7.html$", "/sec0/d/doc17.html"))
    assert(!Robots.patternMatches("/*7.html$", "/sec0/d/doc17.html?a=1"))
    assert(!Robots.patternMatches("", "/anything")) // empty never matches
  }

  // ---- parser ----

  test("parseRules: groups, mixed-case names, comments, crlf, empty values") {
    val body = "# hi\r\nUser-Agent: OtherBot\r\nDisallow: /\r\n\r\n" +
      "user-agent: graftbot\r\nAllow: /keep/ # trailing comment\r\n" +
      "DisAllow: /drop/\r\nAllow:\r\nCrawl-delay: 7\r\nDisallow: /also/\r\n"
    val rules = Robots.parseRules(body, "graftbot")
    assert(rules === IndexedSeq(
      Rule(allow = true, "/keep/"), Rule(allow = false, "/drop/"),
      Rule(allow = false, "/also/")))
  }

  test("parseRules: most-specific token wins; * is the fallback") {
    val body = "User-agent: graft\nDisallow: /short/\n\n" +
      "User-agent: graftbot\nDisallow: /long/\n\n" +
      "User-agent: *\nDisallow: /star/\n"
    assert(Robots.parseRules(body, "graftbot") ===
      IndexedSeq(Rule(allow = false, "/long/")))
    // 'graftb' matches only the shorter prefix group
    assert(Robots.parseRules(body, "graftb") ===
      IndexedSeq(Rule(allow = false, "/short/")))
    assert(Robots.parseRules(body, "unrelated") ===
      IndexedSeq(Rule(allow = false, "/star/")))
  }

  test("parseRules: same-specificity groups merge; rules before any group drop") {
    val body = "Disallow: /orphan/\n" +
      "User-agent: a\nUser-agent: b\nDisallow: /one/\n\n" +
      "User-agent: a\nDisallow: /two/\n"
    assert(Robots.parseRules(body, "a") === IndexedSeq(
      Rule(allow = false, "/one/"), Rule(allow = false, "/two/")))
    // consecutive ua lines are ONE group: 'b' gets the same rules
    assert(Robots.parseRules(body, "b") ===
      IndexedSeq(Rule(allow = false, "/one/")))
  }

  test("parseRules: no matching group at all means allow-all (empty rules)") {
    val body = "User-agent: megabot\nDisallow: /\n"
    assert(Robots.parseRules(body, "graftbot") === IndexedSeq.empty)
    assert(Robots.parseRules(null, "graftbot") === IndexedSeq.empty)
  }

  // ---- decision ----

  test("decide: longest match wins; allow wins ties; default allowed") {
    val rules = Seq(
      Rule(allow = true, "/sec1/d/"), Rule(allow = false, "/sec1/"),
      Rule(allow = false, "/*x.html$"))
    assert(Robots.decide(rules, "/sec1/d/doc.html") === ((true, "/sec1/d/")))
    assert(Robots.decide(rules, "/sec1/other") === ((false, "/sec1/")))
    assert(Robots.decide(rules, "/sec2/q/x.html") === ((false, "/*x.html$")))
    assert(Robots.decide(rules, "/elsewhere") === ((true, null)))
    // tie length, allow preferred (Google tie-break)
    val tie = Seq(Rule(allow = false, "/aa/"), Rule(allow = true, "/ab/"))
    assert(Robots.decide(tie, "/aa/") === ((false, "/aa/")))
    assert(Robots.decide(
      Seq(Rule(allow = false, "/p/"), Rule(allow = true, "/q/")),
      "/p/") === ((false, "/p/")))
    val realTie = Seq(Rule(allow = false, "/p*"), Rule(allow = true, "/p$"))
    assert(Robots.decide(realTie, "/p") === ((true, "/p$")))
  }

  // ---- crawl-delay / sitemap directives ----

  test("parseAgent: crawl-delay is group-scoped, first-wins, regex-gated") {
    val body = Seq(
      "User-agent: megabot", "Crawl-delay: 9", "Disallow: /",
      "User-agent: graftbot", "Allow: /a", "Crawl-delay: 2.5",
      "Crawl-delay: 7", // second delay in the same group: first wins
      "Sitemap: https://x.org/sm.xml",
      "User-agent: *", "Crawl-delay: 4", "Disallow: /z",
      "Sitemap: https://x.org/sm2.xml",
      "Sitemap: https://x.org/sm.xml" // duplicate: first-occurrence dedup
    ).mkString("\n")
    val (rules, delay, sitemaps) = Robots.parseAgent(body, "graftbot")
    assert(rules === IndexedSeq(Robots.Rule(true, "/a")))
    assert(delay === Some(2.5))
    assert(sitemaps === IndexedSeq(
      "https://x.org/sm.xml", "https://x.org/sm2.xml"))
    // * group selected for an unrelated agent -> its delay
    assert(Robots.parseAgent(body, "other")._2 === Some(4.0))
    // unparseable / empty values are ignored; delay before any group drops
    val bad = "Crawl-delay: 3\nUser-agent: g\nCrawl-delay: soon\n" +
      "Crawl-delay:\nDisallow: /q"
    assert(Robots.parseAgent(bad, "g") === ((
      IndexedSeq(Robots.Rule(false, "/q")), None, IndexedSeq.empty)))
    // crawl-delay does NOT close a user-agent run
    val run = "User-agent: a\nCrawl-delay: 1\nUser-agent: graftbot\n" +
      "Disallow: /r"
    assert(Robots.parseAgent(run, "graftbot")._1 ===
      IndexedSeq(Robots.Rule(false, "/r")))
    // embedded whitespace in a sitemap value -> rejected (urls are
    // whitespace-free; hostMeta's space-joined contract depends on it)
    val ws = "User-agent: *\nDisallow:\n" +
      "Sitemap: https://x.org/sm.xml extra junk\n" +
      "Sitemap: https://x.org/a\tb\n" +
      "Sitemap: https://x.org/ok.xml"
    assert(Robots.parseAgent(ws, "graftbot")._3 ===
      IndexedSeq("https://x.org/ok.xml"))
  }

  test("hostMeta: fixture delays and sitemap dedup") {
    import spark.implicits._
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    val out = Robots.hostMeta(robots, RobotsGen.Agent).orderBy("host")
      .collect()
      .map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) null else r.getDouble(1).toString,
        r.getInt(2)))).toMap
    assert(out("site0.example.org") === (("2.0", 2)))  // h%5==0: 2 sitemaps
    assert(out("site1.example.org") === (("2.5", 1)))  // h%4==1 decimal
    assert(out("site5.example.org") === (("2.5", 2)))  // first-wins over 99
    assert(out("site7.example.org") === (("4.0", 1)))  // * group selected
    assert(out("site9.example.org") === ((null, 1)))   // unparseable delay
    assert(out("site10.example.org") === (("2.0", 2))) // duplicate deduped
    assert(!out.contains("site11.example.org"))        // publishes none
  }

  test("annotate: host uses FIRST '://' and scheme-less urls key to ''") {
    import spark.implicits._
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    val out = Robots.annotate(RobotsGen.ExtraUrls.toDF("url"), robots,
        RobotsGen.Agent, saltBuckets = 3)
      .orderBy("url")
      .select("url", "host", "allowed", "rule")
      .collect()
      .map(r => (r.getString(1), r.getBoolean(2), r.getString(3))).toSeq
    assert(out === Seq(
      // query embeds site3 but the OUTER host is site0: /sec0/ disallows
      ("site0.example.org", false, "/sec0/"),
      // query embeds site0 but the OUTER host is site1: no match, allowed
      ("site1.example.org", true, null),
      // no scheme separator: host '' has no robots row -> RFC default
      ("", true, null)))
  }

  test("nextWave: crawl-delay budget binds per host") {
    import spark.implicits._
    def u(h: Int, d: Int) = s"https://site$h.example.org/sec$h/d/doc$d.html"
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    val crawled = Seq(u(0, 0), u(1, 1)).toDF("url")
    // 5 candidates each on host 0 (delay 2 -> budget floor(7/2)=3) and
    // host 11 (no robots -> budget k=5); sec0 allow dir for host 0
    def a0(d: Int) = s"https://site0.example.org/sec0/d/doc$d.html"
    def a11(d: Int) = s"https://site11.example.org/p/doc$d.html"
    val edges = (
      (1 to 5).flatMap(d => Seq((u(0, 0), a0(100 + d), "", 0),
        (u(1, 1), a0(100 + d), "", 0))) ++
      (1 to 5).map(d => (u(0, 0), a11(d), "", 0))
    ).toDF("src", "dst", "anchor", "pos")
    val out = Frontier.nextWave(edges, crawled, robots, RobotsGen.Agent,
        k = 5, saltBuckets = 4, crawlWindowSec = 7.0)
      .collect().map(r => (r.getString(1), r.getInt(3))).toSeq
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(out === Map(
      "site0.example.org" -> 3,   // delay 2, floor(7/2)=3 of 5 candidates
      "site11.example.org" -> 5)) // no robots row: full k
  }

  test("schedule: per-host offsets from hostMeta delay; default for rest") {
    import spark.implicits._
    val wave = Seq(
      ("https://a/1", "a.org", 9L, 1), ("https://a/2", "a.org", 7L, 2),
      ("https://a/3", "a.org", 5L, 3), ("https://b/1", "b.org", 4L, 1),
      ("https://b/2", "b.org", 3L, 2), ("https://c/1", "c.org", 1L, 1),
      ("https://c/2", "c.org", 1L, 2))
      .toDF("url", "host", "refs", "rnk")
    val meta = Seq(("a.org", Some(2.5)), ("b.org", Some(-1.0)))
      .toDF("host", "crawl_delay") // c.org absent; b.org non-positive
    val out = Frontier.schedule(wave, meta)
      .orderBy("host", "rnk")
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      ("https://a/1", 2.5, 0.0), ("https://a/2", 2.5, 2.5),
      ("https://a/3", 2.5, 5.0),
      ("https://b/1", 1.0, 0.0), ("https://b/2", 1.0, 1.0), // default
      ("https://c/1", 1.0, 0.0), ("https://c/2", 1.0, 1.0)))
  }

  // ---- Spark annotate (incl. salted replicate join + missing-robots) ----

  test("annotate matches per-row parse+decide; missing host allowed") {
    import spark.implicits._
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    val urls = Seq(
      "https://site0.example.org/sec0/d/doc13.html",   // allow dir
      "https://site0.example.org/sec0/stray.html",     // disallowed sec
      "https://site0.example.org/sec0/d/doc6.html?a=1&b=6", // wildcard block
      "https://site1.example.org/sec2/d/doc7.html",    // $-anchored block
      "https://site7.example.org/sec2/d/doc9.html",    // no graftbot group
      "https://site11.example.org/sec1/d/doc4.html",   // no robots at all
      "https://site5.example.org/sec0/d/doc40.html?a=1&b=5") // merged group
      .toDF("url")
    val out = Robots.annotate(urls, robots, RobotsGen.Agent, saltBuckets = 3)
      .orderBy("url")
      .select("url", "allowed", "rule")
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSeq
    val expect = Seq(
      ("https://site0.example.org/sec0/d/doc13.html", true, "/sec0/d/"),
      ("https://site0.example.org/sec0/d/doc6.html?a=1&b=6", false,
        "/sec*/d/*?a=1"),
      ("https://site0.example.org/sec0/stray.html", false, "/sec0/"),
      ("https://site1.example.org/sec2/d/doc7.html", false, "/*7.html$"),
      ("https://site11.example.org/sec1/d/doc4.html", true, null),
      ("https://site5.example.org/sec0/d/doc40.html?a=1&b=5", false,
        "/sec*/d/doc*?a=1&b=5$"),
      ("https://site7.example.org/sec2/d/doc9.html", true, null))
    assert(out === expect)
  }

  test("annotate: salted result equals unsalted exactly") {
    import spark.implicits._
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    val urls = (0 until 200)
      .map(i => graft.pipeline.LinkGen.linkUrlFor(i.toLong)).toDF("url")
    val a = Robots.annotate(urls, robots, RobotsGen.Agent, saltBuckets = 1)
      .orderBy("url").collect().toSeq
    val b = Robots.annotate(urls, robots, RobotsGen.Agent, saltBuckets = 8)
      .orderBy("url").collect().toSeq
    assert(a === b)
  }

  test("annotate rejects inputs that already carry its output columns") {
    import spark.implicits._
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    val clashing = Seq(("https://x.org/", "h")).toDF("url", "host")
    val ex = intercept[IllegalArgumentException] {
      Robots.annotate(clashing, robots, RobotsGen.Agent)
    }
    assert(ex.getMessage.contains("rename the input's"))
  }

  // ---- frontier ----

  test("nextWave: semi/anti join + robots gate + exact per-host top-k") {
    import spark.implicits._
    val robots = RobotsGen.rows.toDF("host", "robots_txt")
    // tiny synthetic wave: crawled pages all on host0's allow dir,
    // linking to a mix of crawled/uncrawled/blocked targets
    def u(h: Int, sec: Int, d: Int) =
      s"https://site$h.example.org/sec$sec/d/doc$d.html"
    val crawled = Seq(u(0, 0, 0), u(0, 0, 2)).toDF("url")
    val blocked = "https://site0.example.org/sec0/x6.html" // /sec0/ disallow
    val edges = Seq(
      (u(0, 0, 0), u(0, 0, 4), "a", 0),  // candidate, 2 refs
      (u(0, 0, 2), u(0, 0, 4), "b", 0),
      (u(0, 0, 0), u(0, 0, 2), "c", 1),  // already crawled -> dropped
      (u(0, 0, 2), blocked, "d", 1),     // robots-disallowed -> dropped
      (u(0, 0, 0), u(11, 3, 8), "e", 2), // no robots -> allowed, 1 ref
      (u(9, 9, 9), u(0, 0, 6), "x", 0))  // src not crawled -> ignored
      .toDF("src", "dst", "anchor", "pos")
    val out = Frontier.nextWave(edges, crawled, robots,
      RobotsGen.Agent, k = 5, saltBuckets = 4)
      .orderBy(col("host"), col("rnk"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(out === Seq(
      (u(0, 0, 4), "site0.example.org", 2L, 1),
      (u(11, 3, 8), "site11.example.org", 1L, 1)))
  }

  test("nextWave: per-host budget binds and salted == naive top-k") {
    import spark.implicits._
    val robots = spark.emptyDataset[(String, String)]
      .toDF("host", "robots_txt")
    // 4 crawled referrers; candidate d_i is linked by the first i of them
    val crawled = (1 to 4).map(i => s"https://h.org/s$i").toDF("url")
    val edges = (1 to 20).flatMap { d =>
      (1 to math.min(d, 4)).map(i =>
        (s"https://h.org/s$i", s"https://h.org/d%02d".format(d), "", 0))
    }.toDF("src", "dst", "anchor", "pos")
    val out = Frontier.nextWave(edges, crawled, robots, "graftbot",
      k = 3, saltBuckets = 4).orderBy(col("rnk")).collect()
    // d04..d20 all have refs=4 -> top-3 by (refs desc, url asc)
    assert(out.length === 3)
    assert(out.map(r => (r.getString(0), r.getLong(2), r.getInt(3))).toSeq ===
      Seq(("https://h.org/d04", 4L, 1), ("https://h.org/d05", 4L, 2),
        ("https://h.org/d06", 4L, 3)))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots
import graft.functions.Text

/** RFC 9309 mechanics: group selection (exact beats wildcard,
  * consecutive UA lines share, matching groups merge), value parsing
  * (comments, empty Disallow), pattern matching (* wildcard, $
  * anchor, regex metacharacter escaping), and precedence
  * (longest-match, allow wins ties, no-match allows). Plus the
  * registrable-domain branches.
  */
class RobotsSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def verdicts(robots: String, agent: String,
                       paths: Seq[String]): Map[String, Boolean] = {
    val sites = Seq((1L, robots)).toDF("site", "txt")
    val rules = Robots.parseRobots(sites, "site", "txt", agent)
    val urls = paths.zipWithIndex.map { case (p, i) => (i.toLong, 1L, p) }
      .toDF("uid", "site", "path")
    Robots.isAllowed(urls, rules, "site", "path")
      .select($"path", $"allowed").as[(String, Boolean)]
      .collect().toMap
  }

  test("exact agent group wins over the '*' fallback; rules in the " +
    "unmatched group never apply") {
    val txt = "User-agent: graftbot\nDisallow: /private*\n" +
      "User-agent: *\nDisallow: /"
    val v = verdicts(txt, "graftbot", Seq("/", "/private/x", "/pub"))
    assert(v("/") && v("/pub") && !v("/private/x"))
    // a crawler NOT named falls to the '*' group's deny-all
    val w = verdicts(txt, "otherbot", Seq("/", "/pub"))
    assert(!w("/") && !w("/pub"))
  }

  test("consecutive User-agent lines share one group; matching " +
    "groups merge; comments and empty Disallow are handled") {
    val txt = "User-agent: a\nUser-agent: graftbot\n" +
      "Disallow: /x/ # block x\n" +
      "User-agent: graftbot\nDisallow: /y/\nDisallow:"
    val v = verdicts(txt, "graftbot", Seq("/x/1", "/y/1", "/z"))
    assert(!v("/x/1") && !v("/y/1") && v("/z"))
  }

  test("$ anchors the end, * is a wildcard, regex metacharacters in " +
    "patterns are literal") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a+b\n" +
      "Allow: /docs/*.pdf$"
    val v = verdicts(txt, "any", Seq(
      "/f.pdf", "/f.pdfx", "/docs/f.pdf", "/a+b/c", "/aab"))
    assert(!v("/f.pdf"))          // wildcard + anchor
    assert(v("/f.pdfx"))          // anchor: no match past the end
    assert(v("/docs/f.pdf"))      // longer allow wins
    assert(!v("/a+b/c"))          // '+' literal, prefix match
    assert(v("/aab"))             // '+' not a regex quantifier
  }

  test("precedence: longest pattern wins; allow wins a length tie; " +
    "no matching rule allows") {
    val txt = "User-agent: *\nDisallow: /p\nAllow: /p/q\n" +
      "Disallow: /tie\nAllow: /tie"
    val v = verdicts(txt, "x", Seq("/p/a", "/p/q/b", "/tie/z", "/other"))
    assert(!v("/p/a") && v("/p/q/b"))
    assert(v("/tie/z")) // equal length 4: allow wins
    assert(v("/other"))
  }

  test("a site with no effective rules allows everything — including " +
    "sites absent from the rules table entirely") {
    val sites = Seq((1L, "User-agent: other\nDisallow: /")).toDF(
      "site", "txt")
    val rules = Robots.parseRobots(sites, "site", "txt", "graftbot")
    assert(rules.count() == 0)
    val urls = Seq((1L, 1L, "/a"), (2L, 99L, "/b")).toDF(
      "uid", "site", "path")
    val out = Robots.isAllowed(urls, rules, "site", "path")
      .select($"allowed").as[Boolean].collect()
    assert(out.forall(identity) && out.length == 2)
  }

  test("crawlDelays follows group selection (exact beats '*', a " +
    "foreign agent's delay never applies), keeps the max, ignores " +
    "garbage; schedule slots (rank-1)·delay with the default") {
    val sites = Seq(
      (1L, "User-agent: graftbot\nCrawl-delay: 3\nDisallow: /x\n" +
        "User-agent: *\nCrawl-delay: 7"),
      (2L, "User-agent: otherbot\nCrawl-delay: 9\n" +
        "User-agent: *\nCrawl-delay: 2.5"),
      (3L, "User-agent: graftbot\nCrawl-delay: nonsense"),
      (4L, "User-agent: graftbot\nCrawl-delay: 1\n" +
        "User-agent: graftbot\nCrawl-delay: 6")).toDF("site", "txt")
    val d = Robots.crawlDelays(sites, "site", "txt", "graftbot")
      .as[(Long, Double)].collect().toMap
    assert(d == Map(1L -> 3.0, 2L -> 2.5, 4L -> 6.0))
    val urls = Seq((10L, 1L), (11L, 1L), (12L, 3L), (13L, 3L))
      .toDF("uid", "site")
    val sched = Robots.schedule(urls, d.toSeq.toDF("site", "delay_s"),
        "site", "uid", defaultDelay = 1.5)
      .select($"uid", $"sched_s").as[(Long, Double)].collect().toMap
    assert(sched == Map(10L -> 0.0, 11L -> 3.0, 12L -> 0.0,
      13L -> 1.5))
  }

  test("sitemaps are group-independent (found inside foreign " +
    "groups), comment-stripped, and sitemapLocs reads noisy XML") {
    val sites = Seq(
      (1L, "User-agent: other\nDisallow: /\n" +
        "Sitemap: http://a/s1.xml # main\n" +
        "SITEMAP: http://a/s2.xml"),
      (2L, "User-agent: *\nAllow: /")).toDF("site", "txt")
    val d = Robots.sitemaps(sites, "site", "txt")
      .as[(Long, String)].collect().toSet
    assert(d == Set(1L -> "http://a/s1.xml", 1L -> "http://a/s2.xml"))
    val xml = "<urlset><url><LOC>\n http://x/1 \n</LOC></url>" +
      "<url><loc>http://x/2</loc></url></urlset>"
    val locs = Seq(xml).toDF("x")
      .select(Text.sitemapLocs($"x")).as[Seq[String]].collect().head
    assert(locs == Seq("http://x/1", "http://x/2"))
  }

  test("registrableDomain: two-level suffixes, implicit single-label " +
    "TLD rule, dotless hosts, bare suffixes") {
    val rows = Seq(
      "news.example.co.uk", "example.co.uk", "co.uk",
      "deep.a.b.example.com", "example.com", "localhost",
      "sub.example.com.vn", "example.io").toDF("h")
      .select(Text.registrableDomain($"h")).as[String].collect().toSeq
    assert(rows == Seq(
      "example.co.uk", "example.co.uk", "co.uk",
      "example.com", "example.com", "localhost",
      "example.com.vn", "example.io"))
  }

  test("registrableDomainFromUrl extracts the lowercase host through " +
    "userinfo and ports; suffixesFrom caps its collect") {
    val got = Seq("HTTPS://u:p@News.Example.CO.UK:8443/x?y#z")
      .toDF("u").select(Text.registrableDomainFromUrl($"u"))
      .as[String].collect().head
    assert(got == "example.co.uk")
    val big = (0 until 30).map(i => s"s$i.x").toDF("s")
    intercept[IllegalArgumentException] {
      Text.suffixesFrom(big, "s", maxEntries = 10)
    }
    assert(Text.suffixesFrom(big, "s", maxEntries = 50).length == 30)
  }
}

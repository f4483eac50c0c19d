package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL admission (RFC 9309) — the crawl
  * frontier's politeness gate, next to [[graft.functions.Text.canonicalUrl]]
  * (dedup key) and `registrableDomain` (quota key). The reference
  * fetches feeds it is explicitly configured for (feeds.json), so
  * robots compliance is a beyond-reference surface a general crawl
  * pipeline cannot ship without.
  *
  * Everything is declarative Spark: group assignment is a window
  * cumulative-sum over line numbers, matching is a generated-regex
  * admission join — no driver-side parsing, so a 100 TB frontier
  * check is one rules build (small) plus one equi-join on site.
  */
object Robots {

  /** Parse robots.txt bodies into the EFFECTIVE rule set for one
    * crawler token. Input: one row per site (`siteCol`, `textCol`);
    * output: (`site`, `allow`, `pattern`) rows.
    *
    * RFC 9309 semantics implemented:
    *  - lines are `key: value` with `#` comments stripped; keys
    *    case-insensitive; unknown keys ignored;
    *  - consecutive `User-agent` lines open ONE group shared by them
    *    all (a rule line ends the run);
    *  - the effective group set: every group naming `agent`
    *    (case-insensitive exact token match), else every `*` group —
    *    matching groups MERGE;
    *  - `Allow`/`Disallow` values are path patterns; an EMPTY
    *    `Disallow:` means "no restriction" and produces no rule.
    *
    * Sites whose effective set is empty emit NO rows — absence of
    * rules is "everything allowed", which [[isAllowed]]'s left join
    * encodes.
    */
  def parseRobots(robots: DataFrame, siteCol: String, textCol: String,
                  agent: String): DataFrame =
    effectiveDirectives(robots, siteCol, textCol, agent)
      .filter(col("key").isin("allow", "disallow"))
      .filter(col("value") =!= "") // empty Disallow: = no restriction
      .select(col("site"), (col("key") === "allow").as("allow"),
        col("value").as("pattern"))

  /** `Crawl-delay` per site, from the same effective-group selection
    * as [[parseRobots]] (the de-facto extension most crawlers honor;
    * it is group-scoped like the path rules). Multiple declarations
    * keep the MAXIMUM (politeness errs slow); non-numeric values are
    * ignored. Sites with no effective declaration emit no row —
    * [[schedule]]'s left join supplies the default.
    */
  def crawlDelays(robots: DataFrame, siteCol: String, textCol: String,
                  agent: String): DataFrame =
    effectiveDirectives(robots, siteCol, textCol, agent)
      .filter(col("key") === "crawl-delay")
      // try_cast: ANSI mode is on, and a malformed delay in a crawl
      // robots file must be ignored, not fail the job
      .select(col("site"), expr("try_cast(value AS double)").as("d"))
      .filter(col("d").isNotNull && col("d") >= 0.0)
      .groupBy(col("site")).agg(max(col("d")).as("delay_s"))

  /** `Sitemap:` declarations — (site, sitemap_url) rows. Per the
    * sitemaps protocol these are GROUP-INDEPENDENT (they apply to
    * every crawler and may appear anywhere in the file), so this
    * deliberately bypasses the effective-group selection the other
    * accessors share. The crawl-discovery seed: frontier expansion
    * reads these, fetches the XML, and feeds
    * [[graft.functions.Text.sitemapLocs]] output into admission.
    */
  def sitemaps(robots: DataFrame, siteCol: String,
               textCol: String): DataFrame =
    robots
      .select(col(siteCol).as("site"),
        explode(split(col(textCol), "\n")).as("raw"))
      .select(col("site"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(lower(col("line")).startsWith("sitemap:"))
      .select(col("site"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1))
          .as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Sitemap seed URLs with ONE level of `<sitemapindex>` recursion —
    * what the protocol allows: `roots` are declared sitemap URLs
    * (site, sitemap_url); `pages` is the fetched-XML relation
    * (url, xml). A root whose document is a `<urlset>` contributes
    * its `<loc>`s directly; a `<sitemapindex>` root's `<loc>`s are
    * CHILD sitemap URLs, joined back against `pages` and expanded
    * once (a child that is itself an index is ignored — the spec
    * forbids deeper nesting, and honoring it would unbound the plan).
    * Output: (site, sitemap_url, loc) where `sitemap_url` is the
    * document that directly carried the loc — the child for
    * index-derived rows. Both fetch joins are plain equi-joins on the
    * URL: at crawl scale `pages` is the big side and roots/children
    * stay broadcastable (bounded by robots declarations × index
    * fan-out).
    */
  def sitemapSeeds(roots: DataFrame, pages: DataFrame,
                   maxIndexDepth: Int = 1): DataFrame = {
    val T = graft.functions.Text
    require(maxIndexDepth >= 0 && maxIndexDepth <= 4,
      "sitemap index recursion is bounded (real indexes nest 1-2 deep)")
    def fetched(refs: DataFrame): DataFrame = refs
      .join(pages.withColumnRenamed("url", "sitemap_url"),
        Seq("sitemap_url"))
      .withColumn("kind", T.sitemapKind(col("xml")))
    // level 0 = the robots-declared roots; each further level follows
    // <sitemapindex> children. Depth is a bounded unroll (each level
    // one join against the fetched-pages corpus), not a driver loop
    // over rows — the plan stays a fixed dag at any corpus size.
    var frontier = roots.select(col("site"), col("sitemap_url"))
    var out: DataFrame = null
    var level = 0
    while (level <= maxIndexDepth && frontier != null) {
      val f = fetched(frontier)
      val direct = f.filter(col("kind") === "urlset")
        .select(col("site"), col("sitemap_url"),
          explode(T.sitemapLocs(col("xml"))).as("loc"))
      out = if (out == null) direct else out.unionByName(direct)
      frontier =
        if (level < maxIndexDepth)
          f.filter(col("kind") === "sitemapindex")
            .select(col("site"),
              explode(T.sitemapLocs(col("xml"))).as("sitemap_url"))
        else null
      level += 1
    }
    out
  }

  /** All directives of the groups that apply to `agent`:
    * (site, key, value) with RFC 9309 group selection — comments
    * stripped, consecutive `User-agent` lines share a group, exact
    * agent groups beat `*`, matching groups merge.
    */
  private def effectiveDirectives(robots: DataFrame, siteCol: String,
                                  textCol: String,
                                  agent: String): DataFrame = {
    val lines = robots
      .select(col(siteCol).as("site"),
        posexplode(split(col(textCol), "\n")).as(Seq("ln", "raw")))
      .select(col("site"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("site"), col("ln"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1)))
          .as("key"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow",
        "crawl-delay"))

    val byLine = Window.partitionBy(col("site")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("is_ua", col("key") === "user-agent")
      // a User-agent line opens a new group only if the previous kept
      // line was NOT a User-agent line (consecutive UA lines share)
      .withColumn("new_group", col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(byLine), lit(false)))
      .withColumn("grp",
        sum(col("new_group").cast("long")).over(byLine))

    val uaGroups = grouped.filter(col("is_ua"))
      .select(col("site"), col("grp"), lower(col("value")).as("token"))
    val exact = uaGroups
      .filter(col("token") === agent.toLowerCase(java.util.Locale.ROOT))
      .select(col("site"), col("grp")).distinct()
    val wildcard = uaGroups.filter(col("token") === "*")
      .select(col("site"), col("grp")).distinct()
      // '*' groups apply only where no exact group exists
      .join(exact.select(col("site")).distinct(), Seq("site"),
        "left_anti")
    val effective = exact.unionByName(wildcard)

    grouped.filter(!col("is_ua"))
      .join(effective, Seq("site", "grp"), "left_semi")
      .select(col("site"), col("key"), col("value"))
  }

  /** Politeness schedule: slot each URL `(rank-1) · delay` seconds
    * after its site's window start, rank = position within the site
    * by `orderCol` — the per-host pacing a fetch fleet executes.
    * Sites without a crawl-delay row pace at `defaultDelay`. One
    * window per site; delays broadcast-join (robots-table-sized).
    */
  def schedule(urls: DataFrame, delays: DataFrame, siteCol: String,
               orderCol: String, defaultDelay: Double): DataFrame = {
    val w = Window.partitionBy(col(siteCol)).orderBy(col(orderCol))
    urls
      .join(delays.withColumnRenamed("site", siteCol), Seq(siteCol),
        "left")
      .withColumn("delay_s",
        coalesce(col("delay_s"), lit(defaultDelay)))
      .withColumn("fetch_rank", row_number().over(w))
      .withColumn("sched_s",
        (col("fetch_rank") - 1).cast("double") * col("delay_s"))
  }

  /** Regex form of a robots path pattern: `*` is a wildcard, a
    * trailing `$` anchors the end, everything else is literal
    * (regex metacharacters escaped); match is anchored at the path
    * start (prefix semantics).
    */
  private def patternRegex(pattern: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val anchored = pattern.endsWith("$")
    val body = when(anchored, pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    val escaped = regexp_replace(body,
      "([.^$+?(){}\\[\\]\\\\|])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Admission decision per URL row: join each (`siteCol`,
    * `pathCol`) against the site's rules, keep matching rules, and
    * apply RFC 9309 precedence — the LONGEST pattern wins, an
    * `allow` wins length ties, and a path matching no rule (or a
    * site with no rules) is allowed. Returns the input plus a
    * boolean `allowed`.
    *
    * Scale shape: rules are robots-file-sized (KBs per site); the
    * join is an equi-join on site (broadcast when the rule table is
    * small) and the verdict is `max(struct(hit, plen, allow))` —
    * RFC precedence encoded as struct ordering, so the reduction is
    * MAP-SIDE combinable: the (url × matched-rule) multiplication
    * collapses back to one row per URL before the exchange, and the
    * one shuffle carries URL-count rows, not rule-match rows (a
    * per-URL window would sort-shuffle every matched pair). The URL
    * table is touched once, never a cartesian.
    */
  def isAllowed(urls: DataFrame, rules: DataFrame, siteCol: String,
                pathCol: String): DataFrame = {
    val u = urls.withColumn("__uid", monotonically_increasing_id())
    val r = rules.select(col("site").as(siteCol), col("allow"),
      col("pattern"), patternRegex(col("pattern")).as("rx"),
      length(col("pattern")).as("plen"))
    val matched = u
      .join(r, Seq(siteCol), "left")
      .withColumn("hit", col("rx").isNotNull &&
        regexp_like(col(pathCol), col("rx")))
    // (hit DESC, plen DESC, allow DESC) precedence packed into ONE
    // long — bit 51: a rule matched; bits 1..41: pattern length + 1
    // (clamped; a >2^40-octet robots pattern does not exist); bit 0:
    // allow — so the reduction is a plain integer max and stays in
    // the codegen'd HashAggregate fast path (a struct max falls back
    // to SortAggregate, which re-sorts the multiplied rows). Null
    // rule fields (left-join miss) pack below every real rule.
    val plen = least(coalesce(col("plen"), lit(-1)).cast("long"),
      lit(1L << 40))
    val verdict = max(
      when(col("hit"), lit(1L << 51)).otherwise(lit(0L)) +
        (plen + 1L) * 2L +
        when(coalesce(col("allow"), lit(false)), lit(1L))
          .otherwise(lit(0L)))
    matched
      .groupBy(col("__uid") +: urls.columns.map(col): _*)
      .agg(verdict.as("__v"))
      .withColumn("allowed",
        when(col("__v") >= lit(1L << 51),
          col("__v").bitwiseAND(lit(1L)) === 1L)
          .otherwise(lit(true)))
      .drop("__v", "__uid")
  }
}

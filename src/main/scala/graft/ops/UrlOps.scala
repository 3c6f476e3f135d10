package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL governance for crawl corpora — the per-domain discipline every
  * web-scale pipeline runs before mixing: canonicalize each document's
  * URL (so the same page under cosmetic variants collides), extract
  * the registrable domain (the crawl's natural grouping key), and cap
  * documents per domain (Common Crawl pipelines bound any single
  * site's share of the training mix).
  *
  * Everything is built from `regexp_extract` / array functions in the
  * Java/RE2-identical subset (the [[TextOps.htmlPatterns]] rule), so
  * an external engine replays normalization byte-for-byte.  All ops
  * are per-row projections except the cap, which is one window over
  * `(domain)` — the same shuffle shape as any per-key top-N, AQE-safe,
  * and skew-bounded because the cap itself discards the hot tail.
  */
object UrlOps {

  /** Tracking parameters every canonicalizer strips (regex
    * alternates, matched against `name=` at param start).
    */
  val trackingParamPattern = "^(utm_[a-z]+|gclid|fbclid)="

  /** Multi-part public suffixes the simplified registrable-domain rule
    * recognizes (a full public-suffix list is a broadcast lookup
    * table, not a literal — this subset demonstrates the shape).
    */
  val multiPartSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "gov.uk", "com.au", "co.jp")

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostPortOf(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  private def pathOf(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  private def queryOf(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** Canonical URL: lowercase scheme+host, default port stripped
    * (`:443` for https, `:80` for http), fragment dropped, tracking
    * params removed (surviving params keep their order — reordering
    * would collide URLs whose servers are order-sensitive), empty
    * query dropped.  The path is untouched: case is significant there.
    */
  def normalizeUrl(u: Column): Column = {
    val scheme = schemeOf(u)
    val hostPort = hostPortOf(u)
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val cleanQ = array_join(
      filter(split(queryOf(u), "&"),
        p => !p.rlike(trackingParamPattern) && p =!= lit("")),
      "&")
    concat(scheme, lit("://"), host, pathOf(u),
      when(cleanQ === "", lit("")).otherwise(concat(lit("?"), cleanQ)))
  }

  /** Registrable domain of a URL: the normalized host minus any
    * leading `www.`, cut to the last two labels — or three when the
    * last two form a recognized multi-part suffix (`a.b.co.uk` →
    * `b.co.uk`, not `co.uk`).  Hosts with a single label (or IPs,
    * which have no registrable domain anyway) pass through whole.
    */
  def registrableDomain(u: Column): Column = {
    val host = regexp_replace(
      regexp_replace(hostPortOf(u), ":[0-9]+$", ""), "^www\\.", "")
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(host.rlike("^[0-9.]+$"), host) // IPv4: no registrable domain
      .when(size(labels) <= 2, host)
      .when(last2.isin(multiPartSuffixes: _*) && size(labels) >= 3, last3)
      .otherwise(last2)
  }

  /** Per-domain frequency cap: keep at most `cap` documents per
    * registrable domain, deterministically (rank by `orderCol` inside
    * the domain — ties impossible when it's the id).  Output keeps the
    * domain and the within-domain rank so downstream stages can audit
    * the cut.
    *
    * Scale shape (r12): a LONG `orderCol` routes through the
    * [[graft.plans.TopKPerKey]] whole-operator — per-partition bounded
    * heaps BEFORE the exchange, so a boilerplate domain holding 30% of
    * a 100 TB corpus ships ≤ cap rows per input partition instead of
    * its entire row set through one window task.  The rank is then a
    * window over ≤ cap rows per domain — bounded by construction.  A
    * non-long `orderCol` (or `viaTopK = false`, the A/B + parity
    * reference) takes the plain window form, whose per-task input is
    * the full hot-domain row set — fine at moderate skew, the reason
    * the TopK route is the long-id default.
    */
  def capPerDomain(
      df: DataFrame, urlCol: String, orderCol: String,
      cap: Int, viaTopK: Boolean = true): DataFrame = {
    require(cap > 0, s"cap=$cap must be positive")
    val domained = df.withColumn("domain", registrableDomain(col(urlCol)))
    val w = Window.partitionBy(col("domain")).orderBy(col(orderCol).asc)
    val isLong = df.schema(orderCol).dataType ==
      org.apache.spark.sql.types.LongType
    if (viaTopK && isLong)
      graft.ops.TopKOps.topKPerKey(
          domained, Seq("domain"), Seq(orderCol -> true), cap)
        .withColumn("domain_rank", row_number().over(w))
    else
      domained
        .withColumn("domain_rank", row_number().over(w))
        .filter(col("domain_rank") <= cap)
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the urlkey
    * convention web-archive indexes (Common Crawl's cc-index, CDX
    * servers) sort and prefix-scan by: lowercase, scheme dropped, the
    * host's labels REVERSED and comma-joined (so one registrable
    * domain's pages are contiguous under any sort), leading `www.`
    * and default ports dropped (other ports kept), `)` then the path,
    * then the query parameters SORTED (parameter order is
    * presentation, not identity); fragment dropped.  Pure column
    * expressions — codegen'd projection, no UDF, replayed
    * byte-for-byte by the oracle.  `a.b.com/x?b=2&a=1` →
    * `com,b,a)/x?a=1&b=2`.
    */
  def surtKey(u: Column): Column = {
    val lu = lower(u)
    val scheme = regexp_extract(lu, "^([a-z][a-z0-9+.-]*)://", 1)
    val hostPort = regexp_extract(lu, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    // Default-port strip is SCHEME-AWARE (:443 only for https, :80 only
    // for http) — https://h:80/ keeps its port; it is not the default.
    val host0 = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(host0, "^www\\.", "")
    val hostName = regexp_replace(host, ":[0-9]+$", "")
    val port = regexp_extract(host, ":([0-9]+)$", 1)
    val hostKey = array_join(reverse(split(hostName, "\\.")), ",")
    val path0 = regexp_extract(lu, "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = regexp_extract(lu, "\\?([^#]*)", 1)
    val sortedQ = array_join(
      array_sort(filter(split(q, "&"), p => p =!= lit(""))), "&")
    concat(hostKey,
      when(port === "", lit("")).otherwise(concat(lit(":"), port)),
      lit(")"), path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  // ---- sitemap.xml (sitemaps.org protocol) ---------------------------

  /** One sitemap entry: `kind` is `url` (a page, from `<urlset>`) or
    * `sitemap` (a child sitemap, from `<sitemapindex>` — the 50k-URL
    * protocol limit forces big sites into index files); `lastmod` and
    * `priority` are "" when absent (kept as STRINGS — priority is a
    * decimal the protocol never defines float semantics for).
    */
  final case class SitemapEntry(
      id: Long, entryIdx: Long, kind: String, loc: String,
      lastmod: String, priority: String)

  private val SitemapItem =
    "(?s)<(url|sitemap)\\b[^>]*>(.*?)</\\1>".r
  private val SitemapLoc = "(?s)<loc>\\s*(.*?)\\s*</loc>".r
  private val SitemapLastmod = "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>".r
  private val SitemapPriority = "(?s)<priority>\\s*(.*?)\\s*</priority>".r

  /** Parse one sitemap.xml body (sitemaps.org): `<urlset>` page
    * entries or `<sitemapindex>` child-sitemap entries, each with its
    * `<loc>` (required — entries without one are dropped), optional
    * `<lastmod>`/`<priority>`.  Scanning regex parse (machine-
    * generated XML, not a general XML parser; Scala-side only — the
    * oracle replays closed-form synthesis, so the RE2-subset rule for
    * SQL-replayed patterns doesn't bind here and the closing-tag
    * backreference is fine); the five standard entities are decoded
    * in `loc` (sitemap URLs legally carry `&amp;`).  TOTAL on
    * arbitrary text.
    */
  private[graft] def sitemapEntriesOf(id: Long, xml: String): Seq[SitemapEntry] = {
    if (xml == null) return Nil
    def unescape(s: String): String = s
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt;
    val out = scala.collection.mutable.ArrayBuffer.empty[SitemapEntry]
    var idx = 0L
    for (m <- SitemapItem.findAllMatchIn(xml)) {
      val kind = m.group(1)
      val body = m.group(2)
      SitemapLoc.findFirstMatchIn(body).foreach { locM =>
        val loc = unescape(locM.group(1))
        if (loc.nonEmpty) {
          val lastmod = SitemapLastmod.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("")
          val priority = SitemapPriority.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("")
          out += SitemapEntry(id, idx, kind, loc, lastmod, priority)
          idx += 1
        }
      }
    }
    out.toSeq
  }

  def sitemapEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(xmlCol).cast("string").as("x"))
      .as[(Long, String)]
      .flatMap { case (id, x) => sitemapEntriesOf(id, x) }
      .toDF()
  }

  // ---- RSS/Atom feed census -------------------------------------------

  /** One feed entry: `kind` is `rss` (`<item>` in an RSS 2.0 channel)
    * or `atom` (`<entry>` in an Atom feed); `ts` is the raw declared
    * timestamp string (pubDate / updated — formats differ by kind, a
    * census carries them verbatim), "" when absent.
    */
  final case class FeedEntry(
      id: Long, entryIdx: Long, kind: String, title: String, link: String,
      ts: String)

  private val FeedItem = "(?s)<(item|entry)\\b[^>]*>(.*?)</\\1>".r
  private val FeedTitle = "(?s)<title[^>]*>\\s*(.*?)\\s*</title>".r
  private val FeedLinkRss = "(?s)<link>\\s*(.*?)\\s*</link>".r
  private val FeedLinkAtom = "<link\\b[^>]*href=\"([^\"]*)\"".r
  private val FeedTs = "(?s)<(pubDate|updated)>\\s*(.*?)\\s*</\\1>".r

  /** Parse one syndication feed (RSS 2.0 `<item>`s or Atom
    * `<entry>`s — the crawl-frontier's freshness signal next to
    * sitemaps): title + link (Atom's is the `href` attribute, RSS's
    * the element text) + the raw pubDate/updated string.  Entries
    * without a link are dropped (nothing to crawl); the five standard
    * entities decode in title and link.  Same scanning-parse
    * discipline as the sitemap census.  TOTAL on arbitrary text.
    */
  private[graft] def feedEntriesOf(id: Long, xml: String): Seq[FeedEntry] = {
    if (xml == null) return Nil
    def unescape(s: String): String = s
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")
    val out = scala.collection.mutable.ArrayBuffer.empty[FeedEntry]
    var idx = 0L
    for (m <- FeedItem.findAllMatchIn(xml)) {
      val kind = if (m.group(1) == "item") "rss" else "atom"
      val body = m.group(2)
      val link =
        if (kind == "rss") FeedLinkRss.findFirstMatchIn(body).map(_.group(1))
        else FeedLinkAtom.findFirstMatchIn(body).map(_.group(1))
      link.map(unescape).filter(_.nonEmpty).foreach { l =>
        val title = FeedTitle.findFirstMatchIn(body)
          .map(t => unescape(t.group(1))).getOrElse("")
        val ts = FeedTs.findFirstMatchIn(body).map(_.group(2)).getOrElse("")
        out += FeedEntry(id, idx, kind, title, l, ts)
        idx += 1
      }
    }
    out.toSeq
  }

  def feedEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(xmlCol).cast("string").as("x"))
      .as[(Long, String)]
      .flatMap { case (id, x) => feedEntriesOf(id, x) }
      .toDF()
  }

  // ---- robots.txt (RFC 9309) ----------------------------------------

  /** One parsed robots.txt rule row: the group it belongs to, one of
    * the group's user-agent product tokens (a multi-agent group emits
    * one row per agent), the rule's allow/disallow sense and path
    * pattern, and the group's crawl-delay (-1 when absent; a de facto
    * extension, censused but not used in matching).
    */
  final case class RobotsRule(
      id: Long, groupIdx: Long, agent: String, ruleIdx: Long,
      allow: Boolean, pattern: String, crawlDelayMs: Long)

  /** Parse one robots.txt body (RFC 9309): `field: value` lines,
    * `#` comments stripped, field names case-insensitive; consecutive
    * `User-agent` lines open a group whose allow/disallow rules
    * follow; empty-pattern rules match nothing per the RFC and are
    * dropped; `Sitemap` and unknown fields are ignored.  Patterns
    * keep their `*`/`$` wildcards verbatim — matching semantics live
    * in [[robotsDecide]].  TOTAL on arbitrary text.
    */
  private[graft] def robotsRulesOf(id: Long, robots: String): Seq[RobotsRule] = {
    if (robots == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var groupIdx = -1L
    var agents = Vector.empty[String]
    var inAgentRun = false // consecutive UA lines accumulate one group
    var pending = Vector.empty[(Boolean, String)] // the group's rules
    var crawlDelay = -1L
    def flush(): Unit = {
      if (agents.nonEmpty) {
        for (a <- agents; ((al, pat), ri) <- pending.zipWithIndex)
          out += RobotsRule(id, groupIdx, a, ri.toLong, al, pat, crawlDelay)
      }
      agents = Vector.empty; pending = Vector.empty; crawlDelay = -1L
    }
    for (raw <- robots.split("\n", -1)) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) { flush(); groupIdx += 1 }
            if (value.nonEmpty) agents :+= value.toLowerCase
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty && agents.nonEmpty)
              pending :+= ((field == "allow", value))
          case "crawl-delay" =>
            inAgentRun = false
            try {
              val s = java.lang.Double.parseDouble(value)
              if (s >= 0 && s < 1e6) crawlDelay = (s * 1000).toLong
            } catch { case _: NumberFormatException => () }
          case _ => inAgentRun = false // sitemap/unknown: ignored
        }
      }
    }
    flush()
    out.toSeq
  }

  /** `Sitemap:` directives from robots.txt — the standard frontier-
    * discovery mechanism (sitemaps.org autodiscovery): group-
    * INDEPENDENT per RFC 9309, so they surface regardless of which
    * user-agent group they sit in.  Field name case-insensitive,
    * value verbatim (the spec requires an absolute URL; validation
    * is the consumer's `normalizeUrl` step).  One row per directive
    * in file order.
    */
  private[graft] def robotsSitemapsOf(
      id: Long, robots: String): Seq[(Long, Long, String)] = {
    if (robots == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var idx = 0L
    for (raw <- robots.split("\n", -1)) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val value = line.substring(colon + 1).trim
        if (value.nonEmpty) {
          out += ((id, idx, value))
          idx += 1
        }
      }
    }
    out.toSeq
  }

  def robotsSitemaps(df: DataFrame, idCol: String, robotsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(robotsCol))
      .as[(Long, String)]
      .flatMap { case (id, r) => robotsSitemapsOf(id, r) }
      .toDF("id", "sitemap_idx", "url")
  }

  def robotsRules(df: DataFrame, idCol: String, robotsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(robotsCol).cast("string").as("r"))
      .as[(Long, String)]
      .flatMap { case (id, r) => robotsRulesOf(id, r) }
      .toDF()
  }

  /** RFC 9309 path match: literal octets, `*` matches any run, a
    * TRAILING `$` anchors the end (a non-trailing `$` is literal).
    * Iterative greedy `*` backtracking — linear in practice, never
    * regex (attacker-supplied patterns must not own the engine).
    */
  private[graft] def robotsPathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    // greedy-star match of pat as a PREFIX of path (or full, if anchored)
    val parts = pat.split("\\*", -1)
    var pos = 0
    var k = 0
    while (k < parts.length) {
      val part = parts(k)
      if (k == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else {
        val at =
          if (k == parts.length - 1 && anchored) {
            // last part must END the path
            if (path.length - pos >= part.length &&
              path.endsWith(part)) path.length - part.length else -1
          } else path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      k += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Decide one (agent, path) against parsed rules, RFC 9309 §2.2:
    * the group is the MOST SPECIFIC user-agent match (longest agent
    * token that is a prefix-token match; `*` only when no specific
    * group matches); within it the longest-pattern matching rule wins,
    * allow winning length ties; no matching rule → allowed.
    */
  private[graft] def robotsDecide(
      rules: Seq[RobotsRule], agent: String, path: String): Boolean = {
    val al = agent.toLowerCase
    val specific = rules.filter(r => r.agent != "*" &&
      (al == r.agent || al.startsWith(r.agent + "-") ||
        al.startsWith(r.agent + "/")))
    val pool =
      if (specific.nonEmpty) {
        val best = specific.map(_.agent.length).max
        specific.filter(_.agent.length == best)
      } else rules.filter(_.agent == "*")
    val hits = pool.filter(r => robotsPathMatches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_.pattern.length).max
      hits.exists(r => r.pattern.length == best && r.allow)
    }
  }

  /** Batch crawl-permission evaluation: every (id, path) row decided
    * against ITS OWN document's rules for one crawler agent — the
    * politeness gate a frontier applies before fetch.  Pure
    * partition-local work after one equi-join on id; at 100 TB the
    * rules side is robots metadata (KBs per host), so co-partitioning
    * on host id makes the join map-side.
    */
  def robotsAllowed(
      rules: DataFrame, agent: String,
      urls: DataFrame, idCol: String, pathCol: String): DataFrame = {
    val spark = rules.sparkSession
    import spark.implicits._
    val rulesByDoc = rules.select(col("id"), col("agent"), col("allow"),
      col("pattern")).as[(Long, String, Boolean, String)]
      .groupByKey(_._1)
    val urlsByDoc = urls.select(col(idCol).cast("long").as("id"),
        col(pathCol).cast("string").as("path"))
      .as[(Long, String)]
      .groupByKey(_._1)
    urlsByDoc.cogroup(rulesByDoc) { (id, us, rs) =>
      val rv = rs.map(t =>
        RobotsRule(id, 0, t._2, 0, t._3, t._4, -1)).toVector
      us.map { case (_, path) =>
        (id, path, robotsDecide(rv, agent, path))
      }
    }.toDF("id", "path", "allowed")
  }
}

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
}

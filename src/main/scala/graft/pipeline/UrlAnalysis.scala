package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and domain-level corpus statistics — the inputs to
  * domain blocklists, per-domain quotas, and source-mix reports in a
  * web-scale curation pipeline.
  *
  * Everything is regex over a text column (codegen'd, partition-local)
  * plus one aggregation keyed by domain. The regexes stay inside the
  * RE2 ∩ Java dialect (no backreferences, no lookaround) so an external
  * engine can recompute them verbatim.
  */
object UrlAnalysis {

  /** All `http(s)://…` URLs in `text`, in order of appearance. A URL
    * runs to the next whitespace. */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0))

  /** Registrable host of a URL: the authority component lowercased,
    * with any `www.` prefix and `:port` suffix stripped. Non-URLs
    * yield an empty string. */
  def domain(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, "^https?://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":[0-9]+$", "")

  /** Per-document URL table: one row per extracted URL —
    * `(doc_id, url, domain)`. A map + explode stage, no shuffle. */
  def urlTable(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("doc_id"), explode(urls(textCol)).as("url"))
      .withColumn("domain", domain(col("url")))

  /** Domain-level stats: `(domain, n_urls, n_docs)` — total mentions
    * and distinct documents per domain. One explode + one aggregation;
    * the distinct-doc count plans as Spark's two-phase distinct
    * aggregate (domains are heavy-tailed but the partial aggregation
    * caps per-reducer fan-in at distinct (domain, doc) pairs). */
  def domainStats(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame =
    urlTable(df, idCol, textCol)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))

  // ---- canonicalization (URL-level dedup key) --------------------------

  /** Query parameters dropped by [[canonicalizeUrl]]: click/campaign
    * trackers that vary per visit without changing the resource. */
  val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid)="

  /** Canonical form of a URL — the dedup key a web pipeline groups by
    * before fetching or comparing pages. Deterministic rules, each a
    * regex in the RE2 ∩ Java dialect:
    *
    *   - scheme and host lowercased; leading `www.` dropped
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - tracking parameters ([[TrackingParamPattern]]) removed, other
    *     parameters kept in original order; a now-empty query drops
    *     its `?`
    *   - a single trailing `/` on the path dropped (so `/p/` ≡ `/p`
    *     and `host/` ≡ `host`)
    *
    * Pure column expressions — codegen'd, no shuffle. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host0 = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http",
        regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val pathQueryFrag = regexp_replace(rest, "^[^/?#]*", "")
    val pathQuery = regexp_replace(pathQueryFrag, "#.*$", "")
    val path = regexp_replace(
      regexp_extract(pathQuery, "^([^?]*)", 1), "/$", "")
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val keptParams = filter(split(query, "&"),
      p => !p.rlike(TrackingParamPattern) && p =!= "")
    concat(scheme, lit("://"), host, path,
      when(size(keptParams) > 0,
        concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit("")))
  }

  /** URL-level dedup readout: `(doc_id, url, canon_url, group_n)` —
    * every URL with its canonical key and the number of corpus URLs
    * sharing that key. Canonicalization is a map stage; the group size
    * is one map-side-combined count over canonical keys joined back
    * (the count table is one row per DISTINCT canonical URL — compact
    * even at web scale, and the join key is the same as the
    * aggregation key so AQE can plan it broadcast when small). */
  def urlDedupTable(df: DataFrame, idCol: Column, urlCol: Column)
      : DataFrame = {
    // null URLs carry no canonical key — and a null equi-join key
    // would silently drop the row at the group join; exclude loudly
    val base = df.where(urlCol.isNotNull)
      .select(idCol.as("doc_id"), urlCol.as("url"),
        canonicalizeUrl(urlCol).as("canon_url"))
    val groups = base.groupBy("canon_url")
      .agg(count(lit(1)).as("group_n"))
    base.join(groups, Seq("canon_url"))
      .select("doc_id", "url", "canon_url", "group_n")
  }

  /** Drop documents that mention any blocklisted domain — the
    * domain-filter stage. The blocklist is broadcast (it is a
    * human-curated list, small by construction) and the check is an
    * `exists` over the extracted domains: a pure filter, no shuffle on
    * the corpus side. */
  def dropBlockedDomains(df: DataFrame, textCol: Column,
      blocked: Seq[String]): DataFrame = {
    val blockedLower = blocked.map(_.toLowerCase)
    // null text mentions nothing — keep it (a null predicate would
    // silently drop the row)
    df.where(coalesce(!exists(urls(textCol),
      u => domain(u).isInCollection(blockedLower)), lit(true)))
  }
}

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

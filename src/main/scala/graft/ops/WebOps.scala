package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation operators for web-scale corpus filtering — the
  * standing front door of a crawl pipeline (per-domain quotas, blocklists,
  * provenance stats). Beyond the reference's scope (its providers are a
  * closed set, adsft/rules.py), but a 100-TB web corpus is keyed by URL.
  *
  * All scalar pieces are single regexp/string column expressions chosen to
  * agree between Java regex (Spark) and RE2 (DuckDB oracle): anchored
  * character classes only, no lookaround.
  */
object WebOps {

  /** lowercase authority host of an http(s)/ftp URL; empty string when the
    * value does not parse as a scheme://host URL. Pure codegen'd regexp.
    */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** last two dot-labels of a host ("a.b.example.com" -> "example.com");
    * hosts with fewer than two labels pass through. A public-suffix list
    * would refine multi-label TLDs (co.uk) — a deployment supplies it as a
    * broadcast lookup; the two-label rule is the deterministic core.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
      .otherwise(host)
  }

  /** docs per host, descending, host ascending on ties — the provenance
    * histogram a curation run reports. One shuffle with map-side combine;
    * cardinality is O(hosts), never O(docs), after the partial agg.
    */
  def domainCounts(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .groupBy(urlHost(col(urlCol)).as("host"))
      .agg(count(lit(1)).as("n_docs"))

  /** Drop docs whose host is on a literal blocklist. A Seq-shaped list
    * compiles to an `IN` predicate — codegen'd, no join, pushable — right
    * for the usual few-thousand-entry list.
    */
  def blocklistFilter(docs: DataFrame, blocked: Seq[String],
      urlCol: String = "url"): DataFrame =
    docs.filter(!urlHost(col(urlCol)).isInCollection(blocked.map(_.toLowerCase)))

  /** Blocklist as a table (millions of hosts): broadcast left-anti join —
    * the list ships once per executor, the corpus never shuffles.
    */
  def blocklistFilter(docs: DataFrame, blocked: DataFrame, urlCol: String): DataFrame =
    docs
      .withColumn("_host", urlHost(col(urlCol)))
      .join(broadcast(blocked.select(lower(col("host")).as("_host")).distinct()),
        Seq("_host"), "left_anti")
      .drop("_host")
}

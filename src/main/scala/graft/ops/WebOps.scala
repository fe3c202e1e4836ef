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

  /** Canonical form of a URL for dedup keying: fragment stripped, tracking
    * query parameters (`utm_*`, `fbclid`, `gclid`) removed with their
    * separators repaired, dangling `?` dropped, and the scheme://host
    * prefix lowercased (path and surviving query stay case-sensitive, as
    * the URL spec says they are). A deterministic regexp_replace chain —
    * every pattern anchored-character-class only, so Java regex and RE2
    * produce identical results and a DuckDB oracle can replay it verbatim
    * (global-replace on both engines). Codegen'd, no UDF.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // a tracked param followed by another param: drop it AND its trailing &
    val noMid = regexp_replace(noFrag,
      "(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*&", "")
    // a tracked param in final position: drop it AND its leading ? or &
    val noTail = regexp_replace(noMid,
      "[?&](utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*$", "")
    val noDangling = regexp_replace(noTail, "\\?$", "")
    val prefix = regexp_extract(noDangling, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    concat(lower(prefix), noDangling.substr(length(prefix) + 1, length(noDangling)))
  }

  /** URL-keyed dedup: one document survives per [[canonicalUrl]] — the
    * smallest id wins, so recrawls and scheme/tracking-param variants
    * collapse deterministically. Output: the kept rows plus their
    * `canon_url`.
    *
    * Scale shape: the canonical key is a codegen'd projection; ownership
    * is `min(struct(id, ...))` with map-side partial aggregation (the
    * [[graft.ops.Dedup.incrementalExact]] pattern — a hot URL costs each
    * map task one buffered row, never a window partition).
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.withColumn("canon_url", canonicalUrl(col(urlCol)))
    val rest = keyed.columns.filterNot(_ == "canon_url")
    val ordered = Seq(idCol) ++ rest.filterNot(_ == idCol)
    keyed
      .groupBy("canon_url")
      .agg(min(struct(ordered.map(col): _*)).as("_row"))
      .select(col("canon_url") +: rest.map(c => col(s"_row.$c").as(c)): _*)
  }

  /** Per-source exact-duplicate statistics — the template/boilerplate
    * signal a crawl-curation dashboard ranks domains by: a source whose
    * pages hash to few distinct texts is a mirror farm or a templated
    * catalog, and its keep-quota should shrink accordingly. For each
    * source: total docs, distinct text hashes, docs that share their text
    * with at least one other doc OF THE SAME SOURCE, and the largest
    * single clone family. Complements [[graft.ops.Dedup.exact]] (which
    * dedups the corpus) by LOCALIZING duplication to its origin.
    *
    * Scale shape: two aggregations, both with map-side partial combine —
    * first on the high-cardinality (source, md5(text)) pair key (no skew:
    * even a mega-domain spreads over its distinct texts), then on source
    * over the PRE-AGGREGATED one-row-per-distinct-text stream, where
    * sum/count/max buffers are O(1) per key per task. No window, no join,
    * no driver state.
    *
    * NULL-text rows are EXCLUDED: md5(NULL) is NULL, and grouping would
    * fuse every failed extraction of a source into one giant fake clone
    * family — a healthy domain with many error rows must not read as a
    * mirror farm. (Count error rows separately; they are not "pages that
    * share their text".)
    *
    * Output: (source, n_docs, n_distinct_texts, n_dup_docs, max_copies).
    */
  def sourceDupStats(docs: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    docs
      .filter(col(textCol).isNotNull)
      .select(col(srcCol).as("source"), md5(col(textCol)).as("_h"))
      .groupBy("source", "_h").agg(count(lit(1)).as("_c"))
      .groupBy("source")
      .agg(
        sum("_c").as("n_docs"),
        count(lit(1)).as("n_distinct_texts"),
        sum(when(col("_c") > 1, col("_c")).otherwise(lit(0L))).as("n_dup_docs"),
        max("_c").as("max_copies"))
  }

  /** Domain-level quality rollup + blocklist induction (the
    * RefinedWeb/C4-style "a domain whose pages are mostly junk is junk"
    * rule): per-document quality buckets ([[TextAnalysis.quality]]'s
    * short/fluent/list-like CASE — the SAME contract q20 gates) are
    * aggregated per domain, and a domain is `blocked` when it has at
    * least `minDocs` documents and FEWER than half of them are fluent —
    * integer arithmetic (`n_fluent * 2 < n_docs`), so the threshold is
    * exact cross-engine. The blocked list feeds [[blocklistFilter]]; the
    * rollup is the audit trail for why a domain was cut.
    *
    * Scale shape: per-doc buckets are pure codegen'd column expressions
    * on the scan; then ONE groupBy(domain) whose every aggregate is a
    * constant-size conditional count with map-side partials. A domain
    * with a billion pages costs each map task one buffer row. No window,
    * no join, no driver state.
    *
    * Output: (domain, n_docs, n_fluent, n_short, n_listlike, blocked).
    */
  def domainQuality(docs: DataFrame, minDocs: Long = 3,
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    require(minDocs >= 1, "minDocs must be >= 1")
    def bucketCount(b: String) =
      sum(when(col("quality_bucket") === b, 1L).otherwise(0L))
    TextAnalysis.quality(docs, textCol)
      .groupBy(col(srcCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        bucketCount("fluent").as("n_fluent"),
        bucketCount("short").as("n_short"),
        bucketCount("list-like").as("n_listlike"))
      .withColumn("blocked",
        (col("n_docs") >= minDocs && col("n_fluent") * 2 < col("n_docs"))
          .cast("int"))
  }
}

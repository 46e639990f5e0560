package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-scale pipelines — the identity
  * primitive upstream of crawl dedup, per-host aggregation, and
  * same-page detection. The reference keys its jobs on URLs taken
  * verbatim; at 10^12 documents the same page arrives spelled a dozen
  * ways (case, default ports, fragments, query order), so a canonical
  * form is what makes url-keyed dedup and partitioning correct.
  *
  * Everything here is a pure Column tree over builtin string/array
  * functions (regexp_extract, sort_array, reverse) — codegen'd,
  * scan-local, zero shuffle; no UDFs, no array lambda HOFs (those run
  * interpreted).
  *
  * Scope (documented, deliberate): scheme+host lowercased, default
  * ports stripped (http:80 / https:443), empty path becomes "/",
  * fragment and userinfo dropped, query parameters sorted bytewise
  * with empty segments removed. NOT done: percent-encoding normalization and
  * dot-segment resolution (they need a character-level pass; the
  * pipeline's PctEncode expression covers the minting side).
  */
object UrlOps {

  private def authority(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  /** Lowercased host (no userinfo, no port) of an absolute URL. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(authority(url), "^(?:[^@]*@)?([^:@]*)", 1))

  /** Canonical form of an absolute http(s)-style URL. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val host = hostOf(url)
    val port = regexp_extract(authority(url), ":([0-9]+)$", 1)
    val isDefault = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || isDefault, lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathN = when(path === "", lit("/")).otherwise(path)
    // sort query params bytewise; empty segments ("a=1&&b=2", trailing
    // "&") sort first and are stripped in one regexp — no lambda HOF
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val qSorted = regexp_replace(
      array_join(sort_array(split(query, "&")), "&"), "^&+", "")
    val qPart = when(qSorted === "", lit("")).otherwise(concat(lit("?"), qSorted))
    concat(scheme, lit("://"), host, portPart, pathN, qPart)
  }

  /** SURT-style reversed host (`www.example.org` → `org.example.www`):
    * sorting/range-partitioning by this key co-locates a registrable
    * domain's subdomains — the locality web archives partition on.
    */
  def surtHost(host: Column): Column =
    concat_ws(".", reverse(split(host, "\\.")))
}

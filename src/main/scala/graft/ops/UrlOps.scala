package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain rollups — the web-curation layer of a
  * training-data pipeline (per-domain dedup, domain mixing, crawl-feed
  * overlap all key on the CANONICAL url, not the raw crawl string).
  *
  * Canonical form, applied as pure codegen'd string Columns (split with
  * RE2-safe regexes so the DuckDB oracle states the identical algebra):
  *
  *   1. fragment dropped (`#...` is client-side only);
  *   2. scheme and host lowercased (RFC 3986: both case-insensitive;
  *      the PATH is case-SENSITIVE and stays untouched);
  *   3. a leading `www.` stripped from the host;
  *   4. the port dropped only when it is the scheme DEFAULT (http:80 /
  *      https:443) — a non-default port is addressing, not noise;
  *   5. tracking query parameters removed (utm_*, gclid, fbclid, ref),
  *      the rest kept IN ORDER (re-sorting would merge urls whose
  *      servers treat order as significant);
  *   6. trailing slashes stripped from the path (the bare-root `/`
  *      normalizes to the empty path).
  *
  * Everything is row-local string algebra — zero shuffles; the domain
  * rollup afterwards is one hash aggregation on the extracted host. */
object UrlOps {

  private def extract(u: Column, pattern: String): Column =
    regexp_extract(u, pattern, 1)

  /** Canonical URL per the 6 rules above. */
  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(extract(u, "^([^:/?#]+)://"))
    val hostport = extract(u, "^[^:/?#]+://([^/?#]*)")
    val pathq = regexp_replace(u, "^[^:/?#]+://[^/?#]*", "")
    val path = regexp_replace(extract(pathq, "^([^?]*)"), "/+$", "")
    val query = extract(pathq, "\\?(.*)$")
    val port = extract(hostport, ":([0-9]+)$")
    val host = regexp_replace(lower(regexp_replace(hostport, ":[0-9]+$", "")),
      "^www\\.", "")
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit("") )
      .otherwise(concat(lit(":"), port))
    val kept = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || p.startsWith("ref=") || (p === "")))
    val q = array_join(kept, "&")
    concat(scheme, lit("://"), host, portPart, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Lowercased host with `www.` stripped — the per-domain rollup key. */
  def urlDomain(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val hostport = extract(u, "^[^:/?#]+://([^/?#]*)")
    regexp_replace(lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the dedup/grouping
  * key normalization every crawl pipeline applies before URL-level
  * dedup, domain statistics, and blocklist filtering (the reference's
  * accessor layer has no web ops; this is part of the LLM-pipeline
  * surface around it).
  *
  * Everything is a composition of codegen'd string functions — one
  * projection pass, zero shuffle, no UDF, no regex backtracking on
  * untrusted input (only fixed-delimiter split/substr) — and every
  * step is mirrored verbatim by the DuckDB oracle, so the canonical
  * form is bit-exact cross-engine.
  *
  * Canonical form (documented contract, applied in order):
  *  1. drop the fragment (everything from the first '#');
  *  2. lowercase the scheme and host; path/query case is preserved;
  *  3. strip one leading "www." from the host;
  *  4. drop the default port (":443" for https, ":80" for http);
  *     other ports survive;
  *  5. strip ONE trailing '/' from the path ("/" canonicalizes to "");
  *  6. drop tracking parameters (name starts with "utm_",
  *     case-insensitive, or name ∈ {fbclid, gclid}), sort the
  *     survivors byte-wise, re-join with '&'; an emptied query drops
  *     its '?'.
  */
object Urls {

  private val BIG = 1 << 20 // "to end of string" length for substr

  /** Canonical URL per the contract above. Input must carry a
    * "scheme://" prefix (crawl records do); behavior on other shapes
    * is whatever the fixed-delimiter steps produce.
    *
    * Implemented as the single-pass codegen'd
    * [[graft.functions.TextExpressions.CanonicalUrl]] expression: the
    * equivalent string-function composition ([[canonicalizeComposed]],
    * kept as the executable spec) builds a ~40-node tree that
    * TRIPLICATES through `registrableDomain(canonicalize(url))` —
    * measured ~25s of Catalyst+codegen per plan at round 12. */
  def canonicalize(url: Column): Column =
    graft.functions.TextExpressions.canonical_url(url)

  /** The Column-composition form of [[canonicalize]] — semantics
    * reference for the differential spec; do not use in hot paths (see
    * the tree-size note above). */
  def canonicalizeComposed(url: Column): Column = {
    val u1 = split_part(url, lit("#"), lit(1))
    val sch = lower(split_part(u1, lit("://"), lit(1)))
    val rest = u1.substr(length(split_part(u1, lit("://"), lit(1))) + lit(4), lit(BIG))
    val hostport = split_part(rest, lit("/"), lit(1))
    val host0 = lower(split_part(hostport, lit(":"), lit(1)))
    val port = split_part(hostport, lit(":"), lit(2))
    val host = when(host0.startsWith("www."),
      host0.substr(lit(5), lit(BIG))).otherwise(host0)
    val keepPort = when(port === "" ||
        (sch === "https" && port === "443") ||
        (sch === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pq = rest.substr(length(hostport) + lit(1), lit(BIG))
    val path0 = split_part(pq, lit("?"), lit(1))
    val path = when(path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    val query = split_part(pq, lit("?"), lit(2))
    val params = array_sort(filter(split(query, "&", -1), p =>
      p =!= "" && !lower(p).startsWith("utm_") &&
        !split_part(p, lit("="), lit(1)).isin("fbclid", "gclid")))
    val qstr = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), concat_ws("&", params)))
    concat(sch, lit("://"), host, keepPort, path, qstr)
  }

  /** Naive registrable domain from a CANONICAL url: the last two
    * dot-labels of the host (a stand-in for the public-suffix-list
    * walk, which needs an external dataset) — the key for domain-level
    * counting, rate limits, and blocklists. */
  def registrableDomain(canonUrl: Column): Column = {
    val host = split_part(
      split_part(split_part(canonUrl, lit("://"), lit(2)), lit("/"), lit(1)),
      lit(":"), lit(1))
    concat_ws(".", slice(split(host, "\\."), -2, 2))
  }
}

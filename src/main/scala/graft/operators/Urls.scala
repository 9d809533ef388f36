package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup pass of any web-crawl corpus
  * (CommonCrawl-style pipelines dedup on canonical URL before any content
  * hashing): the same page arrives under `HTTPS://WWW.Host.COM:443/p/?b=2&a=1
  * &utm_source=feed#frag` and `https://host.com/p?a=1&b=2`, and only a
  * canonical form makes those one key.
  *
  * Rules (the standard, order-independent subset — RFC 3986 §6 syntax-based
  * normalization plus the tracking-param strip every crawler applies):
  *   1. drop the fragment;
  *   2. lowercase scheme and host; strip a `www.` prefix and a default
  *      `:80`/`:443` port;
  *   3. strip trailing slashes from the path;
  *   4. drop tracking query params (`utm_*`, `ref`, `fbclid`, `gclid`),
  *      sort the survivors byte-lexicographically, rejoin with `&`.
  *
  * Everything is built from codegen'd string/regex/array built-ins (one
  * projection, no UDF, no shuffle) — canonicalization is map-side work that
  * fuses into the scan, and the dedup it feeds is a plain exact groupBy on
  * the canonical key. At 100 TB the groupBy shuffles hashed-canonical keys
  * (high cardinality, well distributed); nothing here adds to that cost.
  */
object Urls {

  private val TrackingRe = "^(utm_|ref=|fbclid=|gclid=)"

  /** Canonical form of an absolute http(s) URL column. */
  def canonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val base   = regexp_extract(noFrag, "^([^?]*)", 1)
    val query  = regexp_extract(noFrag, "\\?(.*)$", 1)
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1)),
        "^www\\.", ""),
      ":(443|80)$", "")
    val path = regexp_replace(
      regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1),
      "/+$", "")
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(TrackingRe))), "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }
}

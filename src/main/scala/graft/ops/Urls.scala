package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL CANONICALIZATION — the dedup key every crawl pipeline derives
  * before anything else: the same page arrives as `HTTP://WWW.Ex.COM:80
  * /a?utm_source=x&b=2&a=1#frag` and `http://www.ex.com/a?a=1&b=2`, and
  * exact/near dedup both miss it unless the URL is normalized first.
  *
  * Deliberately NOT `java.net.URI` (JVM-specific parsing quirks — the
  * java.text.Normalizer precedent): the parse is ONE anchored regex
  * with explicit groups, and every transform is a regexp/string/array
  * op with identical semantics in DuckDB, so the canonical form
  * replays bit-for-bit cross-engine.
  *
  * Canonical steps (documented contract, applied in this order):
  *  1. scheme and host lowercase (userinfo and path stay
  *     case-sensitive per RFC 3986);
  *  2. default port stripped (`:80` for http, `:443` for https);
  *  3. fragment dropped;
  *  4. tracking params dropped (`utm_*`, `gclid`, `fbclid`);
  *  5. remaining query params sorted bytewise (param order is not
  *     semantic for idempotent GETs — the canonical-order choice);
  *  6. empty path becomes `/`; a trailing slash on a non-root path is
  *     stripped;
  *  7. an empty post-filter query drops its `?`.
  * Rows that do not parse as absolute http(s) URLs canonicalize to
  * NULL — dirty crawl data is a per-row fact to count downstream, not
  * a job failure.
  *
  * Scale: pure per-row narrow projections — no shuffle, no UDF. */
object Urls {

  /** Anchored http(s) URL parse. Groups: 1 scheme, 2 authority,
    * 3 path, 4 query (no '?'), 5 fragment (no '#'). */
  private[graft] val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$"

  private def grp(url: Column, i: Int): Column =
    regexp_extract(url, UrlRe, i)

  /** Lowercased host[:port] with the default port stripped; userinfo
    * (up to the LAST '@') passes through case-sensitively. */
  private def canonAuthority(auth: Column, scheme: Column): Column = {
    val hasUser = auth.contains("@")
    val user = when(hasUser, regexp_extract(auth, "^(.*)@[^@]*$", 1))
    val hostPort = lower(when(hasUser,
      regexp_extract(auth, "^.*@([^@]*)$", 1)).otherwise(auth))
    val noDefault = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    when(hasUser, concat(user, lit("@"), noDefault)).otherwise(noDefault)
  }

  /** Canonical URL per the object contract; NULL for non-URLs. */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(grp(u, 1))
    val auth = canonAuthority(grp(u, 2), scheme)
    val rawPath = grp(u, 3)
    val path = when(rawPath === "", lit("/"))
      .when(rawPath =!= "/", regexp_replace(rawPath, "/$", ""))
      .otherwise(rawPath)
    val params = filter(
      when(grp(u, 4) === "", array().cast("array<string>"))
        .otherwise(split(grp(u, 4), "&", -1)),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)"))
    val query = array_join(array_sort(params), "&")
    val canon = concat(scheme, lit("://"), auth, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(scheme.isin("http", "https") && grp(u, 2) =!= "", canon)
  }

  /** Lowercased bare host (no userinfo, no port) of the ORIGINAL url;
    * NULL for non-URLs. */
  def urlHost(url: Column): Column = {
    val u = trim(url)
    val auth = grp(u, 2)
    val host = lower(regexp_extract(
      regexp_extract(auth, "^(?:.*@)?([^@]*)$", 1), "^([^:]*)", 1))
    when(lower(grp(u, 1)).isin("http", "https") && host =!= "", host)
  }

  /** Last two dot-labels of the host — the registrable-domain
    * APPROXIMATION (an honest simplification: the real answer needs
    * the Public Suffix List, which is versioned external data; two
    * labels are deterministic and version-free, and mis-group only
    * ccTLD-registry hosts like example.co.uk — documented). */
  def urlDomain(url: Column): Column = {
    val h = urlHost(url)
    when(h.isNotNull, regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
  }

  /** Per-row canonical frame: `(idCol, url_norm, host, domain,
    * path_depth)` — the dedup-key view. path_depth counts non-empty
    * path segments of the CANONICAL form. */
  def urlKeys(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val norm = normalizeUrl(col(urlCol))
    df.select(col(idCol), norm.as("url_norm"),
        urlHost(col(urlCol)).as("host"),
        urlDomain(col(urlCol)).as("domain"))
      .withColumn("path_depth",
        when(col("url_norm").isNull, lit(null).cast("int"))
          .otherwise(size(filter(
            split(regexp_extract(col("url_norm"), UrlRe, 3), "/", -1),
            s => s =!= ""))))
  }
}

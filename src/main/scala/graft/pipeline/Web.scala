package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL handling: canonicalization and URL-level dedup.
  *
  * A crawl sees the same page under many spellings — scheme/host case,
  * default ports, `www.`, tracking parameters, parameter order,
  * trailing slashes, fragments. Deduplicating on the RAW url misses
  * all of them; canonicalize-then-group is the standard first dedup
  * stage of a web pipeline (cheaper than any content hash: it needs no
  * page body at all). Engine extension — the reference has no
  * pipeline surface.
  */
object Web {

  /** Query parameters that never affect content — analytics/click ids.
    * One alternation, anchored at the param name, shared verbatim by
    * the DuckDB oracle. Deliberately NOT included: bare `ref` — many
    * real sites overload it as a functional selector (a VCS ref, a
    * listing anchor), so dropping it would merge genuinely distinct
    * pages.
    */
  val TrackingParamRe = "^(utm_[a-z]+|fbclid|gclid|msclkid)="

  /** Canonical form of a URL column, built entirely from codegen-able
    * string expressions (no UDF):
    *
    *   - scheme and host lowercased; `www.` stripped; default port
    *     stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - tracking parameters ([[TrackingParamRe]]) dropped, remaining
    *     query parameters sorted byte-wise (order never affects
    *     content), empty query → no `?`
    *   - trailing slashes stripped from the path
    *
    * A string that does not parse as `scheme://host…` passes through
    * UNCHANGED (never null): an unparseable url is still a dedup key,
    * just an inert one.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val authority = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo (`user:pass@`) is case-SENSITIVE per RFC 3986 §3.2.1 and
    // is no part of the host: preserved verbatim, excluded from the
    // lowercasing / www- / default-port normalization below
    val userinfo = regexp_extract(authority, "^([^@]*@)", 1)
    val hostRaw = lower(regexp_replace(authority, "^[^@]*@", ""))
    val hostNoWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    // anchored to the FIRST '?' and only if it precedes any '#': a '?'
    // inside the fragment is fragment text, not a query string
    val queryStr = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(queryStr, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamRe))
    val q = concat_ws("&", sort_array(params))
    when(scheme === "" || host === "", url)
      .otherwise(concat(scheme, lit("://"), userinfo, host, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** URL-level dedup: group by [[canonicalizeUrl]], keep the smallest
    * id as the canonical representative. One hash aggregation on the
    * canonical string — no pairing, no content, so it runs BEFORE any
    * body is fetched/stored; at 100 TB the shuffle key is a short
    * string with crawl-natural distribution (hot hosts spread across
    * distinct paths). Returns `(canonical_url, keeper_id, n_dups)`.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col(idCol))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Drop-style variant: the kept ROWS (all columns), one per
    * canonical url — the smallest-id member. Same single aggregation
    * plus an id semi-join; the wide row never shuffles twice.
    */
  def dropUrlDups(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.join(urlDedup(df, urlCol, idCol).select(col("keeper_id").as(idCol)),
      Seq(idCol), "left_semi")
}

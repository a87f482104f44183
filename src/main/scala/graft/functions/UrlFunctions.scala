package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition and registered-domain extraction — the host-level
  * grouping key every CommonCrawl-style curation pipeline needs (domain
  * caps, blocklist filtering, host-graph weighting). The reference
  * carries a `url` column from ingest onward (reference:
  * src/llm_data_pipeline/ingest/step.py:84-92) but never parses it;
  * this extends that surface the way CCNet/C4-style pipelines do.
  *
  * Everything here is a pure `Column` expression chain (regexp_extract /
  * regexp_replace / length arithmetic) — zero-shuffle, codegen'd,
  * pushdown-transparent — and each helper is replayable verbatim in
  * ANSI SQL, which is how the d55 gate oracle checks it byte-for-byte.
  *
  * Registered-domain extraction uses an explicit two-level
  * public-suffix list (the standard approach, Mozilla PSL) — bundled
  * here as a small built-in set covering the common ccTLD second levels;
  * real deployments would swap in the full PSL snapshot (a broadcast
  * lookup at scale, same plan shape).
  */
object UrlFunctions {

  /** Two-level public suffixes the built-in extractor recognizes. */
  val twoLevelSuffixes: Seq[String] =
    Seq("co\\.uk", "org\\.uk", "ac\\.uk", "com\\.au", "co\\.jp", "com\\.br", "co\\.in")

  private val suffixAlt = twoLevelSuffixes.mkString("|")

  /** URL scheme (`https` from `https://…`), '' if absent. */
  def scheme(url: Column): Column =
    regexp_extract(url, "^([a-z][a-z0-9+.-]*)://", 1)

  /** Hostname without port ('' if the URL has no authority). */
  def host(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
      ":[0-9]+$", "")

  /** Path component ('' when absent, '/a/b' style otherwise). */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Query string without the '?' ('' when absent). */
  def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Number of non-empty '/'-separated path segments. */
  def pathDepth(p: Column): Column =
    size(filter(split(p, "/"), x => x =!= lit("")))

  /** Number of '&'-separated query parameters (0 for empty query). */
  def paramCount(q: Column): Column =
    when(q === lit(""), lit(0))
      .otherwise(length(q) - length(regexp_replace(q, "&", "")) + lit(1))

  /** Param names [[canonicalize]] strips (anchored prefix match on
    * the `name=` form). */
  val TrackingParamRegex = "^(utm_[a-z]+|gclid|fbclid|ref)="

  /** URL canonicalization ahead of crawl-frontier dedup: lowercase
    * the scheme and authority, drop the fragment, drop tracking
    * parameters (utm_* and gclid, fbclid, ref), SORT the surviving
    * parameters, and strip trailing slashes from non-root paths. The
    * port survives — a different port is a different resource.
    * Scheme-less inputs (`example.com/a`) pass through UNCHANGED:
    * collapsing every unparseable URL to one key would silently merge
    * distinct frontier entries, the worst failure mode for a dedup
    * key. Pure Column regex/array chain (zero shuffle, codegen'd);
    * every step replays in SQL. */
  def canonicalize(url: Column): Column = {
    val schRaw = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    // parse on the scheme-stripped remainder so an uppercase scheme
    // cannot break authority/path extraction
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?#]+)", 1)
    val p0 = regexp_replace(regexp_extract(rest, "^[^/?#]+([^?#]*)", 1), "/+$", "")
    val p = when(p0 === lit(""), lit("/")).otherwise(p0)
    val kept = array_join(array_sort(filter(split(regexp_extract(rest, "\\?([^#]*)", 1), "&"),
      x => x =!= lit("") && !x.rlike(TrackingParamRegex))), "&")
    when(schRaw === lit(""), url).otherwise(
      concat(lower(schRaw), lit("://"), lower(hostPort), p,
        when(kept === lit(""), lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** eTLD+1: the last label before the public suffix, plus the suffix.
    * `cdn.news.bbc.co.uk` → `bbc.co.uk`; `www.example.com` →
    * `example.com`; bare suffixes or single labels → ''. */
  def registeredDomain(h: Column): Column = {
    val twoLevel = regexp_extract(h, s"([^.]+\\.(?:$suffixAlt))$$", 1)
    val oneLevel = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    coalesce(nullif(twoLevel, lit("")), oneLevel)
  }
}

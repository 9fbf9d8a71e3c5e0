package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the first dedup pass of a
  * web-corpus pipeline (cheaper than any content hash: two pages with
  * the same canonical URL are the same document without reading either
  * body). All transforms are `regexp_replace`/`regexp_extract` chains —
  * row-local, codegen'd, RE2-compatible patterns (no lookaround, no
  * backreferences) so the same rules run verbatim in other engines.
  *
  * Canonicalization rules (the common-crawl-style conservative set):
  * strip the fragment, strip tracking query params (`utm_*`, `fbclid`,
  * `gclid`), strip trailing slashes on the path, lowercase scheme and
  * host, strip a leading `www.`, strip explicit default ports
  * (`:80`, `:443`). Path/query case and param order are preserved —
  * reordering params can change semantics, so it is out of scope.
  */
object Urls {

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
  private val RestRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$"
  private val Trackers = "(?:utm_[a-z]+|fbclid|gclid)"

  /** Lowercased host without port or leading `www.`. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, HostRe, 1)),
        "^www\\.", ""),
      ":[0-9]+$", "")

  /** Registered-domain heuristic: the last two host labels. (A full
    * answer needs the public-suffix list; two labels is the standard
    * offline approximation and is what the oracle can reproduce.)
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Canonical form of a URL per the rules above. */
  def normalize(url: Column): Column = {
    // 1. fragment; 2-4. tracking params in mid/head/sole position;
    // 5. trailing path slashes
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrk = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, s"&$Trackers=[^&]*", ""),
        s"\\?$Trackers=[^&]*&", "?"),
      s"\\?$Trackers=[^&]*$$", "")
    val noSlash = regexp_replace(noTrk, "/+(\\?|$)", "$1")
    concat(
      lower(regexp_extract(noSlash, SchemeRe, 1)), lit("://"),
      regexp_replace(
        regexp_replace(lower(regexp_extract(noSlash, HostRe, 1)),
          "^www\\.", ""),
        ":(80|443)$", ""),
      regexp_extract(noSlash, RestRe, 1))
  }

  /** URL-level dedup groups: one row per canonical URL with the
    * surviving (minimum) id and the duplicate count. One hash group-by
    * on the canonical form — map-side partial aggregation does the
    * dedup before the shuffle, so the wide step carries one row per
    * DISTINCT canonical URL, not per page.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.groupBy(normalize(col(urlCol)).as("url_norm"))
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("n_dups"))
}

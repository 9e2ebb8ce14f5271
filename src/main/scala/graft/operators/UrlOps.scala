package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus URL curation — the C4/RefinedWeb-style steps between a raw
  * crawl and a training corpus: canonicalize URLs (so URL-level dedup
  * keys agree), extract the registered domain, and cap documents per
  * domain so no single site dominates the mixture.
  *
  * The reference library has no URL handling (its corpora arrive
  * pre-cleaned); these are the operations its users run upstream. All
  * column builders here compose codegen'd primitives (`regexp_extract`,
  * `filter`, `array_join`) — row-local, zero shuffle, and expressible in
  * plain SQL so the DuckDB oracle can replay them (q135).
  */
object UrlOps {

  /** Query parameters dropped by [[normalize]]: click/campaign trackers
    * that fragment otherwise-identical URLs. Entries are regex atoms
    * matched against the full `key=` prefix. */
  val DefaultTrackingParams: Seq[String] =
    Seq("utm_[^=]*", "gclid", "fbclid", "msclkid", "igshid", "ref")

  /** Multi-label public suffixes where the registered domain is THREE
    * labels (example.co.uk), not two. A pragmatic subset of the public
    * suffix list for the common column-expression path; for the real
    * thing, load `public_suffix_list.dat` with
    * [[PublicSuffixList.fromFile]] and use
    * [[PublicSuffixList.registeredDomainCol]] (full rules, `*.`
    * wildcards, `!` exceptions). */
  val DefaultMultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "or.jp", "ne.jp",
    "com.au", "net.au", "org.au", "co.in", "co.nz", "com.br", "com.mx",
    "com.cn", "com.tw", "com.sg", "co.kr", "co.za")

  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host, optionally with a leading `www.` stripped. */
  def host(url: Column, stripWww: Boolean = true): Column = {
    val h = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    if (stripWww) regexp_replace(h, "^www\\.", "") else h
  }

  /** Explicit port digits, or '' when none. */
  def port(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+)", 1)

  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string between '?' and '#', or '' when none. */
  def query(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Canonical form: lowercase scheme+host, `www.` stripped, default
    * ports (http:80 / https:443) dropped, fragment dropped, trailing
    * path slashes stripped, tracking params removed (param ORDER is
    * preserved — sorting would merge semantically distinct URLs on
    * servers where order matters). Case of path/query is preserved. */
  def normalize(
      url: Column,
      stripWww: Boolean = true,
      trackingParams: Seq[String] = DefaultTrackingParams
  ): Column = {
    val sch = scheme(url)
    val h = host(url, stripWww)
    val p = port(url)
    val defaultPort = (sch === lit("http") && p === lit("80")) ||
      (sch === lit("https") && p === lit("443"))
    val portPart =
      when(p === lit("") || defaultPort, lit("")).otherwise(concat(lit(":"), p))
    val pth = regexp_replace(path(url), "/+$", "")
    val trackRe = "^(?:" + trackingParams.mkString("|") + ")(?:=|$)"
    val kept = filter(split(query(url), "&"),
      x => x =!= lit("") && !x.rlike(trackRe))
    val qs = array_join(kept, "&")
    concat(sch, lit("://"), h, portPart, pth,
      when(qs =!= lit(""), concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Registered (pay-level) domain of a host: last two labels, or last
    * three when the last two are a multi-label public suffix. A bare or
    * two-label host passes through unchanged. */
  def registeredDomain(
      host: Column,
      suffixes: Seq[String] = DefaultMultiLabelSuffixes
  ): Column = {
    val parts = split(host, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(size(parts) <= 2, host)
      .otherwise(when(last2.isInCollection(suffixes), last3).otherwise(last2))
  }

  /** Keep at most `n` rows per `domainField`, chosen deterministically
    * by `orderKey` (ties broken by `tieBreak`) — the standard per-site
    * cap that stops boilerplate-heavy domains from dominating a corpus.
    *
    * Scale shape: ONE window partitioned by domain — parallel across
    * domains, rank state is O(1) per partition stream. A pathological
    * single mega-domain concentrates its rows in one partition; for that
    * regime pre-filter with [[Sampling.keep]] at a fraction that bounds
    * the expected per-domain volume, then cap exactly. */
  def domainCap(
      df: DataFrame,
      domainField: String,
      n: Int,
      orderKey: Column,
      tieBreak: Column
  ): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = Window.partitionBy(col(domainField)).orderBy(orderKey, tieBreak)
    df.withColumn("__dc_rn", row_number().over(w))
      .filter(col("__dc_rn") <= n)
      .drop("__dc_rn")
  }
}

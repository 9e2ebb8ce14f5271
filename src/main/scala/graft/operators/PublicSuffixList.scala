package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The publicsuffix.org `public_suffix_list.dat` format and matching
  * algorithm — the real-list upgrade for
  * [[UrlOps.registeredDomain]]'s pragmatic multi-label subset: parse a
  * caller-supplied copy of the list (rules, `*.` wildcards, `!`
  * exceptions) and resolve a host's public suffix / registered
  * (pay-level) domain exactly as the spec prescribes.
  *
  * Spec rules implemented (publicsuffix.org/list/ algorithm):
  *   - a rule matches when its labels are a suffix of the host's
  *     labels, `*` matching exactly one label;
  *   - exception rules (leading `!`) beat every other match, and their
  *     public suffix is the rule minus its leftmost label;
  *   - otherwise the prevailing rule is the matching rule with the
  *     MOST labels;
  *   - no match → the prevailing rule is `*` (last label);
  *   - registered domain = public suffix plus one more label;
  *     undefined (null) when the host IS a public suffix.
  *
  * Matching is case-insensitive (hosts lowercase before probing);
  * rules are matched literally, so feed punycoded hosts against the
  * list's punycode rules (the .dat ships both forms for IDN suffixes).
  *
  * Scale shape: the list is a few-MB set of strings that serializes
  * once into the task closure (broadcast-sized, like the tokenizer
  * vocabularies); lookup is ≤maxLabels hash probes per row inside a
  * UDF — row-local, zero shuffle. The UDF is a documented non-codegen
  * boundary (same contract as the tokenizer engines): wildcard +
  * exception semantics need ordered set probes no Column algebra
  * expresses.
  *
  * Ref: the reference library has no URL handling (SURVEY §2 note on
  * UrlOps); this implements the public format its users run upstream.
  */
final case class PublicSuffixList(
    exact: Set[String],
    /** wildcard rule `*.foo.bar` stored as `foo.bar`. */
    wildcard: Set[String],
    /** exception rule `!www.ck` stored as `www.ck`. */
    exceptions: Set[String],
    maxLabels: Int
) extends Serializable {

  /** Number of labels in the host's public suffix. */
  def publicSuffixLabels(labels: Array[String]): Int = {
    val l = labels.length
    var k = math.min(l, maxLabels)
    while (k >= 1) {
      val suffix = labels.slice(l - k, l).mkString(".")
      if (exceptions.contains(suffix)) return k - 1
      if (exact.contains(suffix)) return k
      if (k >= 2 && wildcard.contains(labels.slice(l - k + 1, l)
          .mkString("."))) return k
      k -= 1
    }
    1 // the spec's implicit `*` default rule
  }

  /** The host's public suffix (never null: the default rule covers
    * unknown TLDs). */
  def publicSuffix(host: String): String = {
    val labels = normalize(host)
    val ps = publicSuffixLabels(labels)
    labels.slice(labels.length - ps, labels.length).mkString(".")
  }

  /** Registered (pay-level) domain, or null when the host IS a public
    * suffix (registrable domain undefined per the spec). */
  def registeredDomain(host: String): String = {
    val labels = normalize(host)
    val ps = publicSuffixLabels(labels)
    if (labels.length <= ps) null
    else labels.slice(labels.length - ps - 1, labels.length).mkString(".")
  }

  private def normalize(host: String): Array[String] =
    host.toLowerCase(java.util.Locale.ROOT)
      .stripSuffix(".").split('.')
}

object PublicSuffixList {

  /** Parse `public_suffix_list.dat` content: `//` comments and blank
    * lines skipped, everything after the first whitespace on a rule
    * line ignored (the spec's "up to the first whitespace"). */
  def parse(lines: Iterator[String]): PublicSuffixList = {
    val exact = Set.newBuilder[String]
    val wildcard = Set.newBuilder[String]
    val exceptions = Set.newBuilder[String]
    var maxLabels = 1
    lines.foreach { raw =>
      val line = raw.trim.split("\\s+", 2).head
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.toLowerCase(java.util.Locale.ROOT)
        val labels = rule.stripPrefix("!").split('.').length
        if (labels > maxLabels) maxLabels = labels
        if (rule.startsWith("!")) exceptions += rule.substring(1)
        else if (rule.startsWith("*.")) wildcard += rule.substring(2)
        else if (rule == "*") () // explicit default rule: already implicit
        else exact += rule
      }
    }
    PublicSuffixList(exact.result(), wildcard.result(),
      exceptions.result(), maxLabels)
  }

  def fromFile(path: String): PublicSuffixList = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Column builder: registered domain of `host` under this list —
    * null when the host is itself a public suffix. */
  def registeredDomainCol(host: Column, psl: PublicSuffixList): Column = {
    val u = udf((h: String) =>
      if (h == null) null else psl.registeredDomain(h))
    u(host)
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training text extraction — the WET-file step of a web corpus:
  * strip markup to visible text, pull out links and titles. Regex-based
  * by design (no DOM): every transform is a codegen'd
  * `regexp_replace`/`regexp_extract_all` chain that runs inside the
  * scan stage, and the same patterns replay in any RE2-style engine
  * (no backreferences, no lookaround) so the oracle can verify them.
  * A full parser (jsoup-class) only pays off for layout-aware
  * extraction; corpus pipelines overwhelmingly ship the regex shape.
  */
object Html {

  /** Visible text: script/style blocks and comments removed with their
    * content, remaining tags become spaces, the HTML core entities are
    * decoded, whitespace collapsed, ends trimmed. */
  def stripTags(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&" // &amp; LAST: no double-decode
    ).foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** href targets of anchor tags, in document order (double-quoted
    * attributes — the overwhelmingly dominant form in real HTML). */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** <title> content, '' when absent. */
  def extractTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** Collapse CONSECUTIVE duplicate lines inside one document — the
    * row-local cousin of the corpus-wide [[ParagraphDedup]]: repeated
    * nav/boilerplate lines collapse to one occurrence while distant
    * repeats (legitimate refrains) survive. Zero shuffle. */
  def collapseRepeatedLines(text: Column, sep: String = "\n"): Column = {
    val lines = split(text, java.util.regex.Pattern.quote(sep))
    array_join(
      filter(lines, (x, i) => i === 0 || x =!= element_at(lines, i)),
      sep)
  }
}

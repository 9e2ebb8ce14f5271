package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  private val anchorTagRe =
    "(?is)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** (href, anchor) pairs of full anchor tags, in document order —
    * anchor text is the tag's inner content with nested markup
    * stripped and whitespace collapsed. The link-graph TEXT signal:
    * what other pages CALL a target describes it better than the
    * target's own boilerplate (classic anchor-text retrieval). */
  def anchorPairs(html: Column): Column =
    transform(
      regexp_extract_all(html, lit(anchorTagRe), lit(0)),
      t => struct(
        regexp_extract(t, anchorTagRe, 1).as("href"),
        trim(regexp_replace(
          regexp_replace(regexp_extract(t, anchorTagRe, 2), "<[^>]*>", " "),
          "\\s+", " ")).as("anchor")))

  /** Anchor-text index: per link target, total references, distinct
    * referring documents, and the modal anchor text (ties break to the
    * lexicographically LAST anchor via the max-of-struct — a total
    * order, so the pick is deterministic). This is how a web corpus
    * builds target descriptions from the link graph.
    *
    * Shape: the pair explode happens in the scan stage; per-(href,
    * anchor) counts partial-aggregate before the href-keyed shuffle;
    * the modal pick is a max-of-struct fold (no window, no per-href
    * anchor list); distinct referrers ride a pre-deduped second leg
    * joined href-to-href. Output is O(#distinct targets). */
  def anchorIndex(df: DataFrame, idField: String, htmlField: String): DataFrame = {
    val pairs = df
      .select(col(idField).as("__ai_doc"),
        explode(anchorPairs(col(htmlField))).as("a"))
      .select(col("__ai_doc"), col("a.href").as("href"),
        col("a.anchor").as("anchor"))
    val top = pairs
      .groupBy("href", "anchor")
      .agg(count(lit(1)).as("__ai_n"))
      .groupBy("href")
      .agg(
        sum(col("__ai_n")).as("n_refs"),
        max(struct(col("__ai_n").as("n"), col("anchor").as("a"))).as("__ai_t"))
      .select(col("href"), col("n_refs").cast(LongType).as("n_refs"),
        col("__ai_t.a").as("top_anchor"),
        col("__ai_t.n").as("top_anchor_n"))
    val refs = pairs.select("href", "__ai_doc").distinct()
      .groupBy("href").agg(count(lit(1)).as("n_docs"))
    top.join(refs, Seq("href"))
  }

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

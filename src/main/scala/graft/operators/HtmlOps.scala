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

  private val blockSplitRe =
    "(?i)</?(?:p|div|li|h[1-6]|td|tr|ul|ol|table|section|article|header|footer|nav|br)[^>]*>"

  private def visible(s: Column): Column =
    trim(regexp_replace(regexp_replace(s, "<[^>]*>", " "), "\\s+", " "))

  /** Link-density block segmentation — the jusText/Arc90 boilerplate
    * heuristic: split on block-level tag boundaries, and per block
    * measure visible chars vs chars inside anchor tags. Navigation,
    * footers, and link farms are mostly anchor text (high density);
    * body prose is long and link-sparse. `is_content` =
    * `n_chars ≥ minChars AND density ≤ maxPermille`. Row-local regex
    * + HOFs only — zero shuffle, scan-stage, RE2-replayable. */
  def blockStats(
      html: Column,
      minChars: Int = 25,
      maxPermille: Int = 330
  ): Column = {
    val anchorInnerRe = "(?is)<a(?:\\s[^>]*)?>(.*?)</a>"
    filter(
      transform(split(html, blockSplitRe), s => {
        val text = visible(s)
        val n = length(text).cast(LongType)
        val linkChars = aggregate(
          regexp_extract_all(s, lit(anchorInnerRe), lit(1)),
          lit(0L),
          (acc, x) => acc + length(visible(x)).cast(LongType))
        val density = when(n > 0L,
          integralPermille(linkChars, n)).otherwise(lit(0L))
        struct(
          text.as("text"),
          n.as("n_chars"),
          linkChars.as("link_chars"),
          density.as("link_density_permille"),
          (n >= minChars.toLong && density <= maxPermille.toLong)
            .as("is_content"))
      }),
      b => b("n_chars") > 0L)
  }

  private def integralPermille(num: Column, den: Column): Column =
    graft.functions.functions.integral_divide(num * lit(1000L), den)

  /** Per document: block counts and the content-only text (content
    * blocks joined with blank lines) — the jusText-shaped WET
    * extraction that drops nav/footer link farms instead of inlining
    * them into training text. Zero shuffle. */
  def extractContent(
      df: DataFrame,
      idField: String,
      htmlField: String,
      minChars: Int = 25,
      maxPermille: Int = 330
  ): DataFrame = {
    val blocks = blockStats(col(htmlField), minChars, maxPermille)
    val content = filter(blocks, b => b("is_content"))
    df.withColumn("n_blocks", size(blocks).cast(LongType))
      .withColumn("n_content_blocks", size(content).cast(LongType))
      .withColumn("content_chars",
        aggregate(content, lit(0L), (acc, b) => acc + b("n_chars")))
      .withColumn("boiler_chars",
        aggregate(blocks, lit(0L), (acc, b) => acc + b("n_chars"))
          - col("content_chars"))
      .withColumn("content",
        array_join(transform(content, b => b("text")), "\n\n"))
  }

  /** Collapse CONSECUTIVE duplicate lines inside one document — the
    * row-local cousin of the corpus-wide [[ParagraphDedup]]: repeated
    * nav/boilerplate lines collapse to one occurrence while distant
    * repeats (legitimate refrains) survive. Zero shuffle. */
  def collapseRepeatedLines(text: Column, sep: String = "\n"): Column =
    // r13: `lines` is BOUND as a lambda variable (single-element-array
    // trick) — the previous formulation referenced the computed split
    // inside the filter lambda (`element_at(lines, i)`), re-splitting
    // the text once per line: O(lines²·len) for byte-identical output
    // (benign on the short synthetic docs, quadratic on real pages)
    element_at(
      transform(array(split(text, java.util.regex.Pattern.quote(sep))),
        lines =>
          array_join(
            filter(lines, (x, i) => i === 0 || x =!= element_at(lines, i)),
            sep)),
      1)
}

package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full published Gopher document-quality rule set (Rae et al. 2021,
  * "Scaling Language Models", appendix A1.1), as row-local Column
  * expressions: every signal is linear in the document, no shuffle, no
  * UDF — the whole gate is one codegen'd projection, which is what makes
  * it usable as a pre-filter in front of a 100 TB corpus scan.
  *
  * Word-granular approximations are used where Gopher's prose is
  * character-granular (same choice as [[RepetitionStats]], documented
  * per signal). The dup-n-gram fraction counts ALL characters of every
  * occurrence of a duplicated n-gram (occurrence-sum definition — the
  * common reimplementation choice; overlap-coverage dedup would need
  * per-position bookkeeping that SQL engines can't replay).
  */
object GopherQuality {

  /** Thresholds from the paper; a document passes when every bound
    * holds. */
  final case class Config(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFraction: Double = 0.9,
      maxEllipsisLineFraction: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2,
      maxDupLineFraction: Double = 0.3,
      maxDupParaFraction: Double = 0.3,
      maxTopBigramCharFraction: Double = 0.20,
      maxTopTrigramCharFraction: Double = 0.18,
      maxDup5gramCharFraction: Double = 0.15
  )

  private def nonEmptyLines(text: Column): Column =
    filter(split(text, "\n"), l => length(l) > 0)

  private def safeDiv(num: Column, den: Column): Column =
    num.cast(DoubleType) / greatest(den, lit(1)).cast(DoubleType)

  // r14: the four line/paragraph signals below read ONE combined
  // native pass ([[graft.functions.LineStatsExpr]], parity-spec'd
  // against the *Hof twins) — the HOF formulations each re-split the
  // text and ran interpreted filter/array_distinct chains (3 line
  // splits + 1 paragraph split per doc in the full Gopher gate).
  // Identical subtrees collapse via whole-stage codegen's
  // subexpression elimination, so the gate pays a single byte scan.
  private def lineStats(text: Column): Column =
    graft.functions.functions.line_stats(text)

  /** fraction of non-empty lines starting with a bullet marker. */
  def bulletLineFraction(text: Column): Column = {
    val st = lineStats(text)
    safeDiv(st.getField("n_bullet"), st.getField("n_lines"))
  }

  /** fraction of non-empty lines ending in an ellipsis. */
  def ellipsisLineFraction(text: Column): Column = {
    val st = lineStats(text)
    safeDiv(st.getField("n_ellipsis"), st.getField("n_lines"))
  }

  /** fraction of non-empty paragraphs (blank-line separated) duplicating
    * another paragraph. */
  def duplicateParagraphFraction(text: Column): Column = {
    val st = lineStats(text)
    safeDiv(st.getField("n_dup_paras"), st.getField("n_paras"))
  }

  /** Pre-r14 HOF formulations — parity-spec references only. */
  private[graft] def bulletLineFractionHof(text: Column): Column = {
    val lines = nonEmptyLines(text)
    val bullets = filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))
    safeDiv(size(bullets), size(lines))
  }

  private[graft] def ellipsisLineFractionHof(text: Column): Column = {
    val lines = nonEmptyLines(text)
    val ell = filter(lines, l => l.endsWith("...") || l.endsWith("…"))
    safeDiv(size(ell), size(lines))
  }

  private[graft] def duplicateParagraphFractionHof(text: Column): Column = {
    val paras = filter(split(text, "\n\n"), p => length(p) > 0)
    safeDiv(size(paras) - size(array_distinct(paras)), size(paras))
  }

  /** fraction of words containing at least one alphabetic character. */
  def alphaWordRatio(words: Column): Column =
    safeDiv(size(filter(words, w => w.rlike("[A-Za-z]"))), size(words))

  /** hits against the paper's tiny stopword probe set ("the, be, to, of,
    * and, that, have, with") — a CONTENT signal, not language id. */
  val stopProbe: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def stopwordHits(words: Column): Column = {
    val probe = array(stopProbe.map(lit): _*)
    size(filter(words, w => array_contains(probe, w))).cast(LongType)
  }

  private def ngrams(words: Column, n: Int): Column =
    when(
      size(words) >= n,
      transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*)
      )
    ).otherwise(array().cast(ArrayType(StringType)))

  /** characters of the most frequent word n-gram (string length × its
    * occurrence count) over total text characters — Gopher's
    * top-n-gram character fraction, word-granular. One-pass native
    * kernel ([[graft.functions.TopNgramCharsExpr]]); the HOF twin it
    * replaced ([[topNgramCharFractionHof]], kept for the parity spec)
    * rescanned the gram list once per DISTINCT gram — O(G²)
    * interpreted work per document, quadratic in document length.
    * `size(grams) > 0 ⟺ size(words) >= n` (grams was
    * `when(size(words) >= n, sequence(1, size-n+1)...)`, and a null
    * words array nulls the condition either way — both take the
    * otherwise branch). */
  def topNgramCharFraction(text: Column, words: Column, n: Int): Column =
    when(size(words) >= n,
      safeDiv(graft.functions.functions.top_ngram_chars(words, n), length(text)))
      .otherwise(lit(0.0))

  /** characters of ALL occurrences of duplicated n-grams (occurrence-sum
    * definition, see object doc) over total text characters. Same
    * kernel rationale as [[topNgramCharFraction]]
    * ([[graft.functions.DupNgramCharsExpr]]; HOF twin kept below). */
  def dupNgramCharFraction(text: Column, words: Column, n: Int): Column =
    when(size(words) >= n,
      safeDiv(graft.functions.functions.dup_ngram_chars(words, n), length(text)))
      .otherwise(lit(0.0))

  /** The pre-r13 HOF formulation of [[topNgramCharFraction]] — the
    * parity-spec reference only. */
  private[graft] def topNgramCharFractionHof(text: Column, words: Column, n: Int): Column = {
    val grams = ngrams(words, n)
    val counts = transform(array_distinct(grams),
      g => struct(size(filter(grams, x => x === g)).as("c"), length(g).as("l")))
    val top = array_max(counts)
    when(size(grams) > 0,
      safeDiv(top.getField("c") * top.getField("l"), length(text)))
      .otherwise(lit(0.0))
  }

  /** The pre-r13 HOF formulation of [[dupNgramCharFraction]] — the
    * parity-spec reference only. */
  private[graft] def dupNgramCharFractionHof(text: Column, words: Column, n: Int): Column = {
    val grams = ngrams(words, n)
    val dupChars = aggregate(
      transform(array_distinct(grams),
        g => struct(size(filter(grams, x => x === g)).as("c"), length(g).as("l"))),
      lit(0L),
      (acc, s) =>
        acc + when(s.getField("c") >= 2,
          (s.getField("c") * s.getField("l")).cast(LongType)).otherwise(lit(0L))
    )
    when(size(grams) > 0, safeDiv(dupChars, length(text))).otherwise(lit(0.0))
  }
}

/** Append the full Gopher signal block + the pass/fail gate. Input needs
  * `textField` (raw text, for line/paragraph/char signals) and
  * `wordsField` (pre-split words). Output columns: `n_words mean_word_len
  * symbol_ratio bullet_frac ellipsis_frac alpha_ratio stop_hits
  * dup_line_frac dup_para_frac top2_char_frac top3_char_frac
  * dup5_char_frac gopher_pass`. */
final case class GopherQualityFilter(
    textField: String = "text",
    wordsField: String = "words",
    config: GopherQuality.Config = GopherQuality.Config(),
    keepOnly: Boolean = false
) extends Mapper {
  import GopherQuality._
  override def inputFields: Seq[String] = Seq(textField, wordsField)
  override def outputFields: Seq[String] =
    Seq("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
      "ellipsis_frac", "alpha_ratio", "stop_hits", "dup_line_frac",
      "dup_para_frac", "top2_char_frac", "top3_char_frac",
      "dup5_char_frac", "gopher_pass")
  override protected def build(df: DataFrame): DataFrame = {
    val text = col(textField)
    val words = col(wordsField)
    val c = config
    val out = df
      .withColumn("n_words", size(words).cast(LongType))
      .withColumn("mean_word_len",
        aggregate(words, lit(0L), (a, w) => a + length(w)).cast(DoubleType) /
          greatest(size(words), lit(1)).cast(DoubleType))
      .withColumn("symbol_ratio", RepetitionStats.symbolWordRatio(words))
      .withColumn("bullet_frac", bulletLineFraction(text))
      .withColumn("ellipsis_frac", ellipsisLineFraction(text))
      .withColumn("alpha_ratio", alphaWordRatio(words))
      .withColumn("stop_hits", stopwordHits(words))
      .withColumn("dup_line_frac", RepetitionStats.duplicateLineFraction(text))
      .withColumn("dup_para_frac", duplicateParagraphFraction(text))
      .withColumn("top2_char_frac", topNgramCharFraction(text, words, 2))
      .withColumn("top3_char_frac", topNgramCharFraction(text, words, 3))
      .withColumn("dup5_char_frac", dupNgramCharFraction(text, words, 5))
      .withColumn(
        "gopher_pass",
        col("n_words").between(c.minWords, c.maxWords) &&
          col("mean_word_len").between(c.minMeanWordLen, c.maxMeanWordLen) &&
          col("symbol_ratio") <= c.maxSymbolWordRatio &&
          col("bullet_frac") <= c.maxBulletLineFraction &&
          col("ellipsis_frac") <= c.maxEllipsisLineFraction &&
          col("alpha_ratio") >= c.minAlphaWordRatio &&
          col("stop_hits") >= c.minStopwordHits &&
          col("dup_line_frac") <= c.maxDupLineFraction &&
          col("dup_para_frac") <= c.maxDupParaFraction &&
          col("top2_char_frac") <= c.maxTopBigramCharFraction &&
          col("top3_char_frac") <= c.maxTopTrigramCharFraction &&
          col("dup5_char_frac") <= c.maxDup5gramCharFraction
      )
    if (keepOnly) out.filter(col("gopher_pass")) else out
  }
}

/** C4's line- and document-level heuristic cleanup (Raffel et al. 2020
  * §2.2, "Colossal Clean Crawled Corpus" — reference: smashed has no
  * corpus-cleanup stage; this is part of the north-star curation
  * surface). All rules are row-local Column expressions — one codegen'd
  * projection, no shuffle, usable inside the corpus scan stage:
  *
  *   - keep only lines that end in a terminal punctuation mark
  *     (`.`, `!`, `?`, `"`, `'`);
  *   - keep only lines with >= `minLineWords` words (paper: 3 — the
  *     "at least three words" line rule);
  *   - drop any line containing the word "javascript"
  *     (case-insensitive);
  *   - drop the whole document when it has fewer than `minLines` kept
  *     lines, contains "lorem ipsum" (ci), or contains `{` (the code
  *     marker).
  *
  * Word counting uses the same whitespace notion as [[Splitters.Ws]].
  */
object C4Rules {

  final case class Config(
      minLineWords: Int = 3,
      minLines: Int = 3
  )

  private def wordCount(line: Column): Column =
    size(filter(split(line, "\\s+"), w => length(w) > 0))

  /** The kept lines of `text` under the three line rules, in order. */
  def keptLines(text: Column, config: Config = Config()): Column =
    filter(
      split(text, "\n"),
      l =>
        wordCount(l) >= config.minLineWords &&
          regexp_like(rtrim(l), lit("[.!?\"']$")) &&
          !lower(l).contains("javascript")
    )

  /** Cleaned text: kept lines re-joined with newlines. */
  def cleanText(text: Column, config: Config = Config()): Column =
    array_join(keptLines(text, config), "\n")

  /** Document-level gate over the ORIGINAL text + its kept lines. */
  def docPass(text: Column, config: Config = Config()): Column =
    size(keptLines(text, config)) >= config.minLines &&
      !lower(text).contains("lorem ipsum") &&
      !text.contains("{")
}

/** Apply [[C4Rules]]: adds `<dest>` (cleaned text), `c4_kept_lines`
  * (count) and `c4_pass`; `keepOnly` filters to passing docs. */
final case class C4LineFilter(
    textField: String = "text",
    dest: String = "clean_text",
    config: C4Rules.Config = C4Rules.Config(),
    keepOnly: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = Seq(textField)
  override def outputFields: Seq[String] = Seq(dest, "c4_kept_lines", "c4_pass")
  override protected def build(df: DataFrame): DataFrame = {
    val t = col(textField)
    val out = df
      .withColumn(dest, C4Rules.cleanText(t, config))
      .withColumn("c4_kept_lines",
        size(C4Rules.keptLines(t, config)).cast(LongType))
      .withColumn("c4_pass", C4Rules.docPass(t, config))
    if (keepOnly) out.filter(col("c4_pass")) else out
  }
}

/** Blocklist word filtering (the C4 "bad words" rule: drop any page
  * containing a word from a blocklist). The blocklist is SMALL (a few
  * hundred entries) so it inlines as a literal array into the scan-stage
  * predicate — `arrays_overlap` over the lowercased word array is one
  * codegen'd row-local expression: no join, no shuffle, no broadcast
  * variable to manage. For case-sensitive matching pass
  * `caseFold = false`. */
object Blocklist {

  /** True when any word of `words` (case-folded) is in `blocked`. */
  def hit(words: Column, blocked: Seq[String], caseFold: Boolean = true): Column = {
    val probe = array(blocked.sorted.map(lit): _*)
    val ws = if (caseFold) transform(words, w => lower(w)) else words
    arrays_overlap(ws, probe)
  }

  /** The distinct blocked words present in the doc, sorted — the audit
    * column ("why was this dropped"). */
  def hits(words: Column, blocked: Seq[String], caseFold: Boolean = true): Column = {
    val probe = array(blocked.sorted.map(lit): _*)
    val ws = if (caseFold) transform(words, w => lower(w)) else words
    array_sort(array_intersect(array_distinct(ws), probe))
  }
}

/** Apply [[Blocklist]]: adds `blocklist_hit` + `blocklist_hits`;
  * `keepOnly` drops flagged docs (the C4 behavior). */
final case class BlocklistFilter(
    blocked: Seq[String],
    wordsField: String = "words",
    caseFold: Boolean = true,
    keepOnly: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = Seq(wordsField)
  override def outputFields: Seq[String] = Seq("blocklist_hit", "blocklist_hits")
  override protected def build(df: DataFrame): DataFrame = {
    val w = col(wordsField)
    val out = df
      .withColumn("blocklist_hit", Blocklist.hit(w, blocked, caseFold))
      .withColumn("blocklist_hits", Blocklist.hits(w, blocked, caseFold))
    if (keepOnly) out.filter(!col("blocklist_hit")) else out
  }
}

/** Group-level quality gating (the FineWeb/RefinedWeb domain-filtering
  * shape: score DOCUMENTS, gate GROUPS — drop every doc of a domain /
  * source / cluster whose aggregate quality is bad, catching farms whose
  * individual pages pass doc-level rules). The per-group mean is the
  * floor-scaled integer `(scale·sum) div count`, so the gate decision
  * replays bit-identically across engines.
  *
  * Scale shape: ONE partial-aggregated groupBy produces the O(#groups)
  * stats table, which broadcast-joins back onto the corpus — the corpus
  * itself never shuffles. Adds `<groupField>_mean_scaled` + `group_pass`;
  * `keepOnly` filters to passing groups. */
final case class GroupQualityGate(
    groupField: String,
    valueField: String,
    minMeanScaled: Long,
    scale: Long = 1000000L,
    keepOnly: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = Seq(groupField, valueField)
  override def outputFields: Seq[String] =
    Seq(s"${groupField}_mean_scaled", "group_pass")
  override protected def build(df: DataFrame): DataFrame = {
    val stats = df
      .groupBy(col(groupField))
      .agg(graft.functions.functions.integral_divide(
        lit(scale) * sum(col(valueField).cast(LongType)),
        count(lit(1))).as(s"${groupField}_mean_scaled"))
    val out = df
      .join(broadcast(stats), Seq(groupField))
      .withColumn("group_pass",
        col(s"${groupField}_mean_scaled") >= minMeanScaled)
    if (keepOnly) out.filter(col("group_pass")) else out
  }
}

/** Compression-ratio quality signal — the "does this text look like
  * language" proxy used alongside Gopher/C4 rules (gibberish and
  * template spam compress very differently from prose): ratio_ppm =
  * 1e6 · deflate(text).length / text.utf8.length. Low ratios flag
  * highly repetitive boilerplate (near-zero entropy); ratios near or
  * above 1e6 flag random-looking strings (already-compressed blobs,
  * base64, minified junk) that n-gram heuristics misread.
  *
  * Determinism: java.util.zip.Deflater at a FIXED level with a fresh
  * deflater per value — byte-identical output for identical input on
  * a given JVM (zlib version pinned by the runtime), which is the
  * reproducibility contract the engine can honor; the byte stream is
  * NOT replayable in SQL, so this operator is spec-verified (like
  * tokenizer training) rather than oracle-verified. Row-local, zero
  * shuffle; the deflater is per-row but allocation-cheap at corpus
  * text sizes.
  */
object CompressionSignal {

  def deflatedLength(bytes: Array[Byte], level: Int = 6): Int = {
    if (bytes == null || bytes.isEmpty) return 0
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** ratio_ppm = 1e6 · compressed/raw (0 for empty text). */
  def ratioPpm(text: String, level: Int = 6): Long = {
    if (text == null || text.isEmpty) return 0L
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    1000000L * deflatedLength(raw, level) / raw.length
  }
}

/** Appends `outputField` = deflate-ratio ppm of `textField`. */
final case class CompressionRatio(
    textField: String,
    outputField: String = "compress_ppm",
    level: Int = 6
) extends Mapper {
  override def inputFields: Seq[String] = Seq(textField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val lv = level
    val f = udf { (t: String) => CompressionSignal.ratioPpm(t, lv) }
    df.withColumn(outputField, f(col(textField)))
  }
}

/** Flesch readability metrics as integer-exact, row-local Column
  * expressions — the classic prose-complexity signals (Flesch 1948;
  * Kincaid et al. 1975) used to slice a pretraining corpus by reading
  * level or route documents to grade-banded mixes. Everything is one
  * codegen'd projection: a regex vowel-group count per word, a
  * sentence-terminator count per document, two fixed-point formulas.
  * No shuffle, no UDF — usable as a scan-stage annotation at 100 TB.
  *
  * The syllable counter is the standard heuristic (count `[aeiouy]+`
  * runs in the lowercased word, subtract one silent final 'e' after a
  * consonant, floor at 1) — documented approximation; dictionary-true
  * syllabification needs a lexicon no SQL engine replays.
  */
object Readability {

  /** Heuristic syllable count of one word (≥ 1 for any non-empty
    * word; 0 only for the empty string). */
  def syllables(word: Column): Column = {
    val w = lower(word)
    val vg = size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))
    val silentE = w.rlike("[^aeiouy]e$")
    when(vg === 0, lit(0))
      .otherwise(greatest(lit(1), vg - when(silentE, 1).otherwise(0)))
  }

  /** Sentence count: runs of terminator punctuation, floored at 1 so
    * the ratios below stay total on unpunctuated fragments. */
  def sentenceCount(text: Column): Column =
    greatest(lit(1L),
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast(LongType))

  /** Flesch–Kincaid grade level × 100, floor-rounded:
    * `0.39·(W/S) + 11.8·(Syl/W) − 15.59`. Computed over the common
    * denominator `S·W` so the single floor is engine-exact
    * (DuckDB replays it as one `//`). Null when there are no words. */
  def fkGradeCenti(nWords: Column, nSentences: Column, nSyllables: Column): Column =
    when(nWords > 0,
      floor((lit(39L) * nWords * nWords + lit(1180L) * nSyllables * nSentences)
        .cast(DoubleType) / (nSentences * nWords)).cast(LongType) - 1559L)

  /** Flesch Reading Ease × 1000, floor-rounded:
    * `206.835 − 1.015·(W/S) − 84.6·(Syl/W)`. */
  def freMilli(nWords: Column, nSentences: Column, nSyllables: Column): Column =
    when(nWords > 0,
      lit(206835L) - floor((lit(1015L) * nWords * nWords
          + lit(84600L) * nSyllables * nSentences)
        .cast(DoubleType) / (nSentences * nWords)).cast(LongType))
}

/** Appends n_words / n_sentences / n_syllables / fk_grade_centi /
  * fre_milli from a text field and its pre-split words column. */
final case class ReadabilityScore(
    textField: String,
    wordsField: String
) extends Mapper {
  override def inputFields: Seq[String] = Seq(textField, wordsField)
  override def outputFields: Seq[String] =
    Seq("n_words", "n_sentences", "n_syllables", "fk_grade_centi", "fre_milli")
  override protected def build(df: DataFrame): DataFrame = {
    import Readability._
    df.withColumn("n_words", size(col(wordsField)).cast(LongType))
      .withColumn("n_sentences", sentenceCount(col(textField)))
      .withColumn("n_syllables",
        aggregate(col(wordsField), lit(0L),
          (acc, w) => acc + syllables(w).cast(LongType)))
      .withColumn("fk_grade_centi",
        fkGradeCenti(col("n_words"), col("n_sentences"), col("n_syllables")))
      .withColumn("fre_milli",
        freMilli(col("n_words"), col("n_sentences"), col("n_syllables")))
  }
}

/** Sliding-window lexicon density — the context-LOCAL complement to the
  * document-level [[Blocklist]] ratio: a 5,000-word page with one
  * paragraph of concentrated profanity/NSFW terms passes any whole-doc
  * hit-ratio gate (the hits are diluted 100:1), yet that paragraph is
  * exactly what a safety filter must catch. This operator reports, per
  * document, the maximum number of lexicon hits inside ANY sliding
  * window of `windowWords` consecutive words, the word index where
  * that window starts, and the gate flag `density_hit` (max >=
  * `minHits`).
  *
  * Exactness: a maximal window can always be anchored AT a hit (sliding
  * a window left until its first hit enters costs nothing), so the scan
  * enumerates only hit positions — count of hits in [p, p+W) per hit
  * position p, argmax with ties to the EARLIEST start. Deterministic
  * integers end to end; a SQL oracle replays it with the same list
  * algebra.
  *
  * Shape at 100 TB: row-local higher-order functions, zero shuffle.
  * Work per row is O(n_words + h²) where h = lexicon hits in the doc —
  * h is near-zero on clean corpora, so the quadratic term never
  * materializes at scale; the O(n·W) naive window sum is exactly what
  * this formulation avoids. */
final case class WindowLexiconDensity(
    lexicon: Seq[String],
    wordsField: String = "words",
    windowWords: Int = 100,
    minHits: Int = 3,
    caseFold: Boolean = true
) extends Mapper {
  override def inputFields: Seq[String] = Seq(wordsField)
  override def outputFields: Seq[String] =
    Seq("lex_hits", "max_window_hits", "window_start", "density_hit")
  override protected def build(df: DataFrame): DataFrame = {
    // caseFold must fold BOTH sides: a mixed-case lexicon entry would
    // otherwise never match the lowercased words.
    val probe = array(
      (if (caseFold) lexicon.map(_.toLowerCase) else lexicon)
        .distinct.sorted.map(lit): _*)
    val ws =
      if (caseFold) transform(col(wordsField), w => lower(w))
      else col(wordsField)
    // 0-based word positions of lexicon hits (bound via the
    // single-element-array trick so `ws` evaluates once per row)
    val hitPos = flatten(transform(array(ws), w =>
      filter(
        transform(sequence(lit(1), greatest(size(w), lit(1))), i => i - 1),
        i => size(w) > 0 && array_contains(probe, element_at(w, i + 1)))))
    val perAnchor = (ps: Column) =>
      transform(ps, p =>
        struct(
          size(filter(ps, x => x >= p && x < p + windowWords))
            .cast(LongType).as("c"),
          (-p).cast(LongType).as("np"))) // max picks EARLIEST on ties
    df.withColumn("__wl_ps", hitPos)
      .withColumn("lex_hits", size(col("__wl_ps")).cast(LongType))
      .withColumn("__wl_best",
        when(col("lex_hits") > 0,
          array_max(flatten(transform(array(col("__wl_ps")), perAnchor)))))
      .withColumn("max_window_hits",
        coalesce(col("__wl_best.c"), lit(0L)))
      .withColumn("window_start",
        when(col("lex_hits") > 0, -col("__wl_best.np"))
          .otherwise(lit(null).cast(LongType)))
      .withColumn("density_hit", col("max_window_hits") >= minHits)
      .drop("__wl_ps", "__wl_best")
  }
}

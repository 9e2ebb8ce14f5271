package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.functions.integral_divide

/** Gale–Church sentence alignment cost (Gale & Church 1993, "A Program
  * for Aligning Sentences in Bilingual Corpora") — the classic
  * length-based bitext aligner, here as the ALIGNMENT-COST filter: the
  * minimal dynamic-programming cost of aligning two documents'
  * sentence-length arrays under the standard bead set (1-1 match,
  * 1-0/0-1 skip, 2-1/1-2 merge). Low cost ⇒ the pair is translation-
  * parallel sentence for sentence; high cost ⇒ a misaligned or
  * unrelated pair that would poison a bitext mining run — the
  * complement of [[BitextMining]]'s embedding margin, using nothing
  * but lengths.
  *
  * Integer variant (engine-exact): the per-bead length-match cost is
  * the ‰-scaled relative length gap `(1000·|x−y|) div (x+y+1)` instead
  * of the paper's Gaussian log-likelihood, and the bead priors are the
  * paper's −100·log₂(prob) shape rounded to integers (skip 450,
  * merge 230, match 0). Monotone in the same quantities, replayable
  * bit-for-bit in any SQL engine (the oracle runs the identical DP via
  * nested list folds).
  *
  * Scale shape: the whole DP is ROW-LOCAL — two O(n) rows of state
  * folded over the m source sentences, O(m·n) integer ops per pair,
  * zero shuffle, zero driver state. Document pairs with m·n in the
  * usual 10²-10⁴ range cost microseconds; the operator composes with
  * any pairing front end (bucketed candidate join, cross-source
  * matrix) without changing its shuffle story.
  */
object GaleChurch {

  private val Inf = 1000000000000000L

  /** `sequence(1, c)` that is EMPTY (not descending) when `c < 1`. */
  private def seq1to(c: Column): Column =
    filter(sequence(lit(1), greatest(c, lit(1))), x => x <= c)

  /** ‰-scaled relative length-gap cost of matching total source
    * length `x` against total target length `y`. */
  private def matchCost(x: Column, y: Column): Column =
    integral_divide(lit(1000L) * abs(x - y), x + y + lit(1L))

  /** Minimal alignment cost of sentence-length arrays `aLens` and
    * `bLens` (both `array<bigint>`). Empty sides degrade to all-skip
    * cost (`#sentences · skip`). */
  def alignCost(
      aLens: Column,
      bLens: Column,
      skip: Long = 450L,
      merge: Long = 230L
  ): Column = {
    val n = size(bLens)
    // state layout: positions 1..n+1 = DP row i-2, n+2..2n+2 = row i-1
    val row0 = transform(sequence(lit(0), n), j => j.cast(LongType) * skip)
    val state0 = concat(transform(sequence(lit(1), n + 1), _ => lit(Inf)), row0)
    val fin = aggregate(
      seq1to(size(aLens)),
      state0,
      (st, i) => {
        val p2 = slice(st, lit(1), n + 1)
        val p1 = slice(st, n + 2, n + 1)
        val ai = element_at(aLens, i)
        val newRow = aggregate(
          seq1to(n),
          array(element_at(p1, 1) + skip),
          (row, j) => {
            val bj = element_at(bLens, j)
            val up = element_at(p1, j + 1) + skip
            val left = element_at(row, j) + skip
            val diag = element_at(p1, j) + matchCost(ai, bj)
            val two1 = when(i >= 2,
              element_at(p2, j) + merge +
                matchCost(element_at(aLens, i - 1) + ai, bj))
              .otherwise(lit(Inf))
            val one2 = when(j >= 2,
              element_at(p1, j - 1) + merge +
                matchCost(ai, element_at(bLens, j - 1) + bj))
              .otherwise(lit(Inf))
            concat(row, array(least(up, left, diag, two1, one2)))
          })
        concat(p1, newRow)
      })
    element_at(fin, n * 2 + 2)
  }

  /** Sentence lengths of a text: char length of each non-empty
    * terminator-delimited segment, in order. */
  def sentenceLengths(text: Column): Column =
    filter(
      transform(split(text, "[.!?]+"), s => length(trim(s)).cast(LongType)),
      l => l > 0L)

  /** Exposed for the sibling DP operators below. */
  private[graft] def seq1toCol(c: Column): Column = seq1to(c)

  /** Score candidate pairs: appends `n_src`/`n_tgt` sentence counts,
    * the DP `gc_cost`, and `gc_cost_per_bead` (cost ÷ (n_src+n_tgt),
    * ‰-scale like the cost itself) — the size-comparable number to
    * threshold on. */
  def scorePairs(
      pairs: DataFrame,
      srcLensField: String,
      tgtLensField: String,
      skip: Long = 450L,
      merge: Long = 230L
  ): DataFrame =
    pairs
      .withColumn("n_src", size(col(srcLensField)).cast(LongType))
      .withColumn("n_tgt", size(col(tgtLensField)).cast(LongType))
      .withColumn("gc_cost",
        alignCost(col(srcLensField), col(tgtLensField), skip, merge))
      .withColumn("gc_cost_per_bead",
        integral_divide(col("gc_cost"),
          greatest(col("n_src") + col("n_tgt"), lit(1L))))
}

/** Longest-common-subsequence overlap between word sequences —
  * ROUGE-L (Lin 2004), the order-aware overlap measure: unlike n-gram
  * containment (q185/q232's family), LCS credits in-order but
  * non-contiguous overlap, which is what paraphrased or lightly-edited
  * reuse looks like. Use it to score eval-set contamination at
  * summary granularity or to verify near-dup candidates where edits
  * break contiguous grams.
  *
  * Integer-exact: `lcs_len` is the classic DP; the F-measure
  * 2·P·R/(P+R) with P = lcs/n, R = lcs/m collapses to 2·lcs/(m+n),
  * emitted as a ppm floor — one integral divide, no doubles. The DP is
  * ROW-LOCAL (one O(n) state row folded over the m source words,
  * O(m·n) per pair, zero shuffle); cap word counts upstream for
  * pathological pairs — the counts are output columns.
  */
object LcsOverlap {

  /** LCS length of two `array<string>` columns. */
  def lcsLen(aWords: Column, bWords: Column): Column = {
    val n = size(bWords)
    val row0 = transform(sequence(lit(0), n), _ => lit(0L))
    val fin = aggregate(
      GaleChurch.seq1toCol(size(aWords)),
      row0,
      (prev, i) =>
        aggregate(
          GaleChurch.seq1toCol(n),
          array(lit(0L)),
          (row, j) => concat(row, array(
            when(element_at(aWords, i) === element_at(bWords, j),
              element_at(prev, j) + 1L)
              .otherwise(greatest(
                element_at(prev, j + 1),
                element_at(row, j)))))))
    element_at(fin, n + 1)
  }

  /** Appends `n_a`/`n_b`/`lcs_len`/`rouge_l_f_ppm` to candidate
    * pairs. */
  def rougeL(pairs: DataFrame, aField: String, bField: String): DataFrame =
    pairs
      .withColumn("n_a", size(col(aField)).cast(LongType))
      .withColumn("n_b", size(col(bField)).cast(LongType))
      .withColumn("lcs_len", lcsLen(col(aField), col(bField)))
      .withColumn("rouge_l_f_ppm",
        when(col("n_a") + col("n_b") > 0L,
          integral_divide(lit(2000000L) * col("lcs_len"),
            col("n_a") + col("n_b"))).otherwise(lit(0L)))
}

/** Markdown section outline — heading-aware long-document structure
  * for section-level chunking (RAG passages, per-section quality
  * gates, structure-preserving striding): every ATX heading
  * (`#`..`######`) opens a section running to the next heading or the
  * document end. Row-local `split` + HOFs over the line array, zero
  * shuffle; both the outline and each section's text come out of ONE
  * projection.
  */
object MarkdownOutline {

  /** array<struct<level,title,line_no,n_lines,sec_text>> per doc,
    * empty when the text has no headings; `line_no` is 0-based.
    *
    * r13: `lines` and `hIdx` are BOUND as lambda variables via the
    * single-element-array trick (the Winnowing/LangIdNgram fix) — the
    * previous formulation referenced the computed `split` and heading
    * `filter` columns inside HOF lambdas, re-evaluating the full line
    * split per line probe and the full heading scan per section
    * (quadratic in lines × sections for byte-identical output). */
  def sections(text: Column): Column =
    element_at(
      transform(array(split(coalesce(text, lit("")), "\n")), lines =>
        element_at(
          transform(
            array(filter(
              sequence(lit(1), size(lines)),
              i => element_at(lines, i).rlike("^#{1,6} "))),
            hIdx => {
              val ks = filter(
                sequence(lit(1), greatest(size(hIdx), lit(1))),
                k => k <= size(hIdx))
              transform(ks, k => {
                val i = element_at(hIdx, k)
                val line = element_at(lines, i)
                val next = when(k + 1 <= size(hIdx), element_at(hIdx, k + 1))
                  .otherwise(size(lines) + 1)
                struct(
                  length(regexp_extract(line, "^(#{1,6}) ", 1)).cast(LongType)
                    .as("level"),
                  regexp_extract(line, "^#{1,6} +(.*)$", 1).as("title"),
                  (i - 1).cast(LongType).as("line_no"),
                  (next - i).cast(LongType).as("n_lines"),
                  array_join(slice(lines, i, next - i), "\n").as("sec_text"))
              })
            }),
          1)),
      1)

  /** Explode to one row per section (docs without headings disappear;
    * keep them with a left anti-join on the result if needed). */
  def sectionize(df: DataFrame, idField: String, textField: String): DataFrame =
    df.select(col(idField), explode(sections(col(textField))).as("s"))
      .select(col(idField), col("s.level").as("level"),
        col("s.title").as("title"), col("s.line_no").as("line_no"),
        col("s.n_lines").as("n_lines"), col("s.sec_text").as("sec_text"))
}

/** Ranking agreement — comparing two rankers over the same items: a
  * BM25 run vs an embedding run, yesterday's quality scorer vs
  * today's, two near-dup survivor policies. Two complementary
  * measures:
  *
  *  - **RBO** (rank-biased overlap, Webber et al. 2010), truncated at
  *    the list length: top-weighted prefix-overlap agreement between
  *    two RANKED ID LISTS — disagreement at rank 1 costs more than at
  *    rank 10. `(1−p)·Σ p^(d−1)·X_d/d` with the standard incremental
  *    X_d; the geometric weights fold sequentially in doubles, so both
  *    engines produce the identical IEEE value before the one ppm
  *    floor.
  *  - **Kendall τ-b** between two parallel SCORE ARRAYS: concordant −
  *    discordant over all pairs with the standard tie corrections; the
  *    four counters are exact integers, the final normalization is one
  *    deterministic sqrt expression.
  *
  * Both are ROW-LOCAL O(k²) folds — zero shuffle; list lengths are the
  * caller's k (tens to hundreds), not corpus sizes.
  */
object RankAgreement {

  /** Truncated RBO (ppm) of two ranked id lists (compared over the
    * shorter length; p = top-weightedness, 0.9 ≈ top-10 emphasis).
    * Null when either list is empty — the same no-evidence contract as
    * [[kendallTauPpm]] (an empty prefix carries no agreement signal
    * either way, and 0 would read as "maximal disagreement"). */
  def rboPpm(a: Column, b: Column, p: Double = 0.9): Column = {
    val k = least(size(a), size(b))
    val fin = aggregate(
      GaleChurch.seq1toCol(k),
      array(lit(0.0), lit(1.0), lit(0.0)), // [X_d, p^(d-1), acc]
      (st, d) => {
        val xPrev = element_at(st, 1)
        val pw = element_at(st, 2)
        val acc = element_at(st, 3)
        val ad = element_at(a, d)
        val bd = element_at(b, d)
        val inc =
          when(ad === bd, lit(1.0)).otherwise(
            array_contains(slice(b, lit(1), d - 1), ad).cast("double") +
              array_contains(slice(a, lit(1), d - 1), bd).cast("double"))
        val xd = xPrev + inc
        array(xd, pw * p, acc + pw * xd / d.cast("double"))
      })
    // the ppm scale folds (1−p) into ONE exact pre-rounded constant:
    // 1.0 − 0.9 is not the double 0.1, and a replaying engine's decimal
    // literal would be — so neither form is used; both sides multiply
    // by round(1e6·(1−p)) instead
    val w = math.round(1000000.0 * (1.0 - p)).toDouble
    when(k > 0,
      floor(lit(w) * element_at(fin, 3)).cast(LongType))
      .otherwise(lit(null).cast(LongType))
  }

  /** Kendall τ-b (ppm) between two parallel numeric arrays. Null when
    * either side is all-ties (zero denominator) or under 2 items. */
  def kendallTauPpm(x: Column, y: Column): Column = {
    val n = least(size(x), size(y))
    val counts = aggregate(
      GaleChurch.seq1toCol(n - 1),
      transform(sequence(lit(1), lit(4)), _ => lit(0L)), // [c, d, t1, t2]
      (st, i) =>
        aggregate(
          filter(sequence(lit(1), greatest(n, lit(1))), j => j > i && j <= n),
          st,
          (s2, j) => {
            val dx = signum(element_at(x, i) - element_at(x, j))
            val dy = signum(element_at(y, i) - element_at(y, j))
            array(
              element_at(s2, 1) + (dx * dy > 0).cast(LongType),
              element_at(s2, 2) + (dx * dy < 0).cast(LongType),
              element_at(s2, 3) + (dx === 0).cast(LongType),
              element_at(s2, 4) + (dy === 0).cast(LongType))
          }))
    val c = element_at(counts, 1)
    val d = element_at(counts, 2)
    val t1 = element_at(counts, 3)
    val t2 = element_at(counts, 4)
    val n0 = (n.cast(LongType) * (n - 1).cast(LongType)) / lit(2L)
    // equal tie corrections (the common no-ties case included) skip the
    // sqrt pair: sqrt(v)·sqrt(v) ≠ v in doubles, and a perfect ±1 must
    // come out as exactly ±1e6, not ∓1e6∓1
    val den = when(t1 === t2, (n0 - t1).cast("double"))
      .otherwise(
        sqrt((n0 - t1).cast("double")) * sqrt((n0 - t2).cast("double")))
    when(n >= 2 && (n0 - t1) > 0L && (n0 - t2) > 0L,
      floor(lit(1000000.0) * (c - d).cast("double") / den).cast(LongType))
  }
}

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

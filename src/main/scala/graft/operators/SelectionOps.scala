package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via hashed-feature importance ratios, the DSIR shape
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score each raw document by how much its hashed-token
  * distribution resembles a (small) target corpus relative to the raw
  * corpus, then keep the high scorers. Feature space is `dim` hash
  * buckets, so the two distribution estimates are O(dim) tables no
  * matter the corpus size.
  *
  * Engine-parity note: the published method scores with summed
  * log-likelihood ratios (doubles); `ln` is not bit-identical across
  * engines, so the weight here is the INTEGER ratio
  * `((ct+1)·scale) div (cr+1)` — exact in any engine, same ordering
  * intent (target-heavy buckets weigh more), oracle-verifiable. The
  * log-ratio production variant is a one-line swap at the weight array.
  */
object DsirScore {

  /** Hash-bucket occurrence counts of `wordsField` tokens: at most
    * `dim` rows regardless of input size (map-side partial agg does the
    * heavy lifting). */
  def bucketCounts(
      df: DataFrame,
      wordsField: String,
      dim: Int,
      indexOf: Column => Column
  ): DataFrame =
    df.select(explode(col(wordsField)).as("__t"))
      .select(indexOf(col("__t")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Importance weight per bucket, add-one smoothed:
    * `((ct[b]+1)·scale) div (cr[b]+1)`. Two dim-bounded aggregates
    * collected to the driver (the literal-inline pattern: dim ≤ a few
    * thousand, independent of corpus size). */
  def weights(
      target: DataFrame,
      raw: DataFrame,
      wordsField: String,
      dim: Int,
      scale: Long = 1000000L,
      indexOf: Column => Column
  ): Array[Long] = {
    def counts(df: DataFrame): Map[Long, Long] =
      bucketCounts(df, wordsField, dim, indexOf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = counts(target)
    val cr = counts(raw)
    Array.tabulate(dim) { b =>
      ((ct.getOrElse(b.toLong, 0L) + 1L) * scale) / (cr.getOrElse(b.toLong, 0L) + 1L)
    }
  }

  /** Per-document score: sequential fold over the token array summing
    * each token's bucket weight. The weight array rides along as a
    * LITERAL, so scoring is row-local — zero shuffle, scan-stage. */
  def score(
      words: Column,
      weights: Seq[Long],
      indexOf: Column => Column
  ): Column =
    aggregate(words, lit(0L),
      (acc, t) => acc + element_at(typedLit(weights), (indexOf(t) + 1).cast("int")))
}

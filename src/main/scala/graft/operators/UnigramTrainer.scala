package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM vocabulary training — the sentencepiece-family
  * counterpart of [[BpeTrainer]] (Kudo 2018, "Subword Regularization",
  * §3.2's EM, with the common Viterbi/hard-EM E-step simplification:
  * each round counts pieces along the current BEST segmentation instead
  * of integrating over the lattice).
  *
  * Scale design mirrors BpeTrainer: the corpus collapses to ONE bounded
  * (word, freq) table (|distinct words| ≪ |corpus| by Heaps' law), and
  * all rounds run against it:
  *   - seed vocab: every substring (length ≤ maxPieceLen) of the
  *     marker-prefixed distinct words, frequency-weighted, topped to
  *     `vocabSize`×4 candidates plus ALL single chars (coverage floor);
  *   - E-step: executor-local Viterbi per distinct word against the
  *     broadcast scored vocab ([[UnigramTokenizer]] itself, shipped in
  *     the task closure) → (piece, freq) pairs;
  *   - M-step: map-side-combined groupBy piece → counts; the ≤|vocab|
  *     count rows come to the driver, which renormalizes log-probs and
  *     prunes to `vocabSize` (single chars always survive).
  * The corpus text itself is never reshuffled — only word keys and
  * piece keys move. Returns (piece, logProb) rows ready for
  * [[UnigramTokenizer.fromScores]].
  */
object UnigramTrainer {

  def train(
      df: DataFrame,
      wordsField: String,
      vocabSize: Int,
      maxPieceLen: Int = 6,
      rounds: Int = 3
  ): Seq[(String, Double)] = {
    require(vocabSize > 0 && maxPieceLen > 0 && rounds >= 0,
      "vocabSize, maxPieceLen must be positive; rounds non-negative")
    val spark = df.sparkSession
    import spark.implicits._

    // ONE corpus pass → bounded (marker-prefixed word, freq) table
    val wordFreq: Dataset[(String, Long)] = df
      .select(explode(col(wordsField)).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => ("▁" + w, f) }
      .localCheckpoint()

    // seed: substrings weighted by word frequency; keep the top
    // vocabSize*4 candidates + every single char (coverage floor)
    val subs = wordFreq.flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + maxPieceLen)
      } yield (w.substring(i, j), f)
    }
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
    val singles = subs.filter(_._1.length == 1).collect()
    val multis = subs.filter(_._1.length > 1)
      .orderBy(col("_2").desc, col("_1"))
      .limit(vocabSize * 4)
      .collect()

    def toScored(counts: Seq[(String, Long)]): Seq[(String, Double)] = {
      val total = math.max(1L, counts.map(_._2).sum)
      counts
        .sortBy { case (p, c) => (-c, p) }
        .map { case (p, c) =>
          p -> (math.log(c.toDouble) - math.log(total.toDouble))
        }
    }

    var scored = toScored((singles ++ multis).toSeq)

    var r = 0
    while (r < rounds) {
      // hard-EM E-step: Viterbi counts against the current vocab. The
      // tokenizer is built on the driver and shipped once per task.
      val tok = UnigramTokenizer.fromScores(scored)
      val inv = scored.zipWithIndex
        .map { case ((p, _), i) => (4L + i) -> p }.toMap
      val counts = wordFreq
        .flatMap { case (w, f) =>
          // the word already carries its ▁ marker; strip it before
          // encode (the tokenizer re-adds the dummy prefix)
          tok.encodePieces(w.stripPrefix("▁")).toSeq.collect {
            case (id, _, _) if id != tok.unkId => (inv(id), f)
          }
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }
        .collect()
        .toSeq
      // M-step + prune: single chars always survive (coverage floor —
      // chars that fell out of use keep a floor count of 1), and the
      // multi-piece budget is what remains of vocabSize after ALL of
      // them, so |vocab| never exceeds vocabSize
      val (chars, pieces) = counts.partition(_._1.length == 1)
      val charFloor = singles.map(_._1).toSet
        .map((c: String) => c -> chars.toMap.getOrElse(c, 1L)).toSeq
      val kept = pieces.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - charFloor.size))
      scored = toScored(charFloor ++ kept)
      r += 1
    }
    scored
  }
}

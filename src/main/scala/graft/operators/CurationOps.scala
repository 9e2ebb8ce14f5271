package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus curation ops a production training-data pipeline needs beyond
  * dedup/quality: benchmark decontamination and reproducible sampling.
  * Both follow the 100 TB discipline — the corpus side never shuffles
  * (broadcast joins on hashes / row-local hash predicates only).
  */

/** Benchmark decontamination: flag/remove training documents sharing any
  * word n-gram with an evaluation set (the standard 13-gram rule from
  * the GPT-3/PaLM data cards — `n` is a parameter). The benchmark side
  * is small by construction, so its n-gram hash set BROADCASTS; document
  * n-grams are generated and probed inside the scan stage (explode →
  * broadcast-hash-join → distinct on hit ids): the corpus itself never
  * shuffles, only the (tiny) contaminated-id set does. */
object Decontaminate {

  /** Strict word n-grams: empty below n words (no whole-text fallback —
    * a 3-word doc must not collide with a 3-word benchmark fallback). */
  def ngrams(words: Column, n: Int): Column =
    when(
      size(words) >= n,
      transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*)
      )
    ).otherwise(array().cast(ArrayType(StringType)))

  /** Append `outputField`: true iff the doc shares an n-gram with
    * `bench`. `hasher` is the join key (production xxhash64; pass md5
    * for engine-portable replay). */
  def flag(
      docs: DataFrame,
      idField: String,
      wordsField: String,
      bench: DataFrame,
      benchWordsField: String,
      n: Int = 13,
      outputField: String = "contaminated",
      hasher: Column => Column = c => xxhash64(c)
  ): DataFrame = {
    val bg = bench
      .select(explode(ngrams(col(benchWordsField), n)).as("__g"))
      .select(hasher(col("__g")).as("__gh"))
      .distinct()
    val hits = docs
      .select(col(idField), explode(ngrams(col(wordsField), n)).as("__g"))
      .select(col(idField), hasher(col("__g")).as("__gh"))
      .join(broadcast(bg), Seq("__gh"))
      .select(idField)
      .distinct()
      .withColumn(outputField, lit(true))
    docs
      .join(broadcast(hits), Seq(idField), "left")
      .withColumn(outputField, coalesce(col(outputField), lit(false)))
  }

  /** Drop contaminated docs. */
  def remove(
      docs: DataFrame,
      idField: String,
      wordsField: String,
      bench: DataFrame,
      benchWordsField: String,
      n: Int = 13,
      hasher: Column => Column = c => xxhash64(c)
  ): DataFrame =
    flag(docs, idField, wordsField, bench, benchWordsField, n,
      "__graft_contaminated", hasher)
      .filter(!col("__graft_contaminated"))
      .drop("__graft_contaminated")
}

/** Deterministic hash-based sampling: a row survives iff a salted hash
  * of its id falls under the fraction threshold — reproducible across
  * runs, machines, and engines (no RNG state), stable under
  * repartitioning, and row-local (zero shuffle). The standard way to
  * build fixed data mixtures: per-stratum fractions give weighted
  * source/language mixing with one codegen'd predicate. */
object Sampling {

  /** Production predicate: `pmod(xxhash64(id || salt), 1e9) < frac·1e9`. */
  def keep(id: Column, fraction: Double, salt: String = "graft"): Column =
    pmod(xxhash64(concat(id.cast(StringType), lit(salt))), lit(1000000000L)) <
      lit((fraction * 1e9).toLong)

  /** Engine-portable variant: the first 8 md5 hex chars compare below the
    * fraction's 32-bit hex threshold — lexicographic on lowercase hex ==
    * numeric, and every SQL engine has md5 + substring. */
  def keepMd5(id: Column, fraction: Double, salt: String = "graft"): Column =
    substring(md5(concat(id.cast(StringType), lit(salt))), 1, 8) <
      lit(hexThreshold(fraction))

  /** 8-hex-char threshold for a fraction (floor(frac · 2^32)). */
  def hexThreshold(fraction: Double): String = {
    val t = math.max(0L, math.min(4294967296L, (fraction * 4294967296L).toLong))
    f"$t%08x"
  }

  /** Production stratified: per-value fraction on `strata` (default for
    * the rest), long thresholds through a map literal over the same
    * codegen'd xxhash64 predicate — still one row-local expression. */
  def keepStratified(
      id: Column,
      strata: Column,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String = "graft"
  ): Column = {
    def t(f: Double): Long = (f * 1e9).toLong
    val entries = fractions.toSeq.sortBy(_._1).flatMap { case (k, f) =>
      Seq(lit(k), lit(t(f)))
    }
    val thresh =
      if (entries.isEmpty) lit(t(defaultFraction))
      else coalesce(element_at(map(entries: _*), strata), lit(t(defaultFraction)))
    pmod(xxhash64(concat(id.cast(StringType), lit(salt))), lit(1000000000L)) <
      thresh
  }

  /** Engine-portable stratified variant (md5 hex thresholds). */
  def keepStratifiedMd5(
      id: Column,
      strata: Column,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String = "graft"
  ): Column = {
    val entries = fractions.toSeq.sortBy(_._1).flatMap { case (k, f) =>
      Seq(lit(k), lit(hexThreshold(f)))
    }
    val thresh =
      if (entries.isEmpty) lit(hexThreshold(defaultFraction))
      else coalesce(
        element_at(map(entries: _*), strata),
        lit(hexThreshold(defaultFraction)))
    substring(md5(concat(id.cast(StringType), lit(salt))), 1, 8) < thresh
  }
}

/** Deterministic global shuffle: order rows by a salted hash of their id
  * — the training-order randomization every pretraining pipeline ends
  * with, reproducible across runs/engines (no RNG state) and re-keyable
  * by salt per epoch. At scale this is exactly one range-partitioned
  * distributed sort (Spark samples the hash space, so output partitions
  * are balanced no matter how skewed the ids); the hash tie-breaks on
  * the id itself, making the order total and the output stable. */
final case class DeterministicShuffle(
    idField: String,
    salt: String = "graft",
    portable: Boolean = false
) extends graft.Mapper {
  override def inputFields: Seq[String] = Seq(idField)
  override protected def build(df: DataFrame): DataFrame = {
    val key =
      if (portable)
        md5(concat(col(idField).cast(StringType), lit(salt)))
      else
        xxhash64(concat(col(idField).cast(StringType), lit(salt)))
          .cast(StringType)
    df.orderBy(key, col(idField))
  }
}

/** Mapper form of [[Sampling]]: keep a deterministic `fraction` of rows
  * (optionally per-stratum). `portable` switches the md5 variant on for
  * cross-engine replay; production default is codegen'd xxhash64. */
final case class DeterministicSample(
    idField: String,
    fraction: Double,
    salt: String = "graft",
    strataField: Option[String] = None,
    strataFractions: Map[String, Double] = Map.empty,
    portable: Boolean = false
) extends graft.Mapper {
  override def inputFields: Seq[String] = Seq(idField) ++ strataField
  override protected def build(df: DataFrame): DataFrame = {
    val pred = (strataField, portable) match {
      case (Some(sf), true) =>
        Sampling.keepStratifiedMd5(col(idField), col(sf), strataFractions,
          fraction, salt)
      case (Some(sf), false) =>
        Sampling.keepStratified(col(idField), col(sf), strataFractions,
          fraction, salt)
      case (None, true) => Sampling.keepMd5(col(idField), fraction, salt)
      case (None, false) => Sampling.keep(col(idField), fraction, salt)
    }
    df.filter(pred)
  }
}

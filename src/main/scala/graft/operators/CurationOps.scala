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

  /** [[flag]] with a Bloom filter instead of the exact broadcast set —
    * for evaluation suites too big to broadcast exactly (a full
    * many-benchmark union at 13-gram granularity can reach billions of
    * grams ≈ tens of GB of exact hashes, but a 1%-fpp Bloom filter is
    * ~1.2 bytes/gram). One-sided error: a contaminated doc is ALWAYS
    * flagged; a clean doc is flagged with probability ≤ `fpp` per gram —
    * the safe direction for decontamination, where a false positive only
    * drops a clean training doc. Spark's native BloomFilter aggregate
    * builds the filter in one distributed pass; membership probes run
    * inside the scan stage via `might_contain`, corpus never shuffles. */
  def flagBloom(
      docs: DataFrame,
      idField: String,
      wordsField: String,
      bench: DataFrame,
      benchWordsField: String,
      n: Int = 13,
      fpp: Double = 0.01,
      outputField: String = "contaminated",
      hasher: Column => Column = c => xxhash64(c)
  ): DataFrame = {
    val benchGrams = bench
      .select(explode(ngrams(col(benchWordsField), n)).as("__g"))
      .select(hasher(col("__g")).as("__gh"))
      .distinct()
      .persist()
    val nGrams = math.max(1L, benchGrams.count())
    // distributed treeAggregate build; merge is a bitwise OR, so the
    // result is order-independent (deterministic)
    val bf = benchGrams.stat.bloomFilter("__gh", nGrams, fpp)
    benchGrams.unpersist()
    val bcast = docs.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((h: Long) => bcast.value.mightContainLong(h))
    val flagged = docs
      .select(col(idField), explode(ngrams(col(wordsField), n)).as("__g"))
      .select(col(idField), hasher(col("__g")).as("__gh"))
      .filter(probe(col("__gh")))
      .select(idField)
      .distinct()
      .withColumn(outputField, lit(true))
    docs
      .join(broadcast(flagged), Seq(idField), "left")
      .withColumn(outputField, coalesce(col(outputField), lit(false)))
  }

  /** Contamination-SPAN audit — the release-notes companion to [[flag]]:
    * a boolean tells you a doc overlaps a benchmark; the LENGTH of the
    * longest contiguous contaminated stretch separates "quoted one
    * sentence" (short span — maybe keep + cite) from "contains the
    * whole eval item" (long span — must drop). Per doc: total grams,
    * hit grams, the longest run of CONSECUTIVE contaminated gram
    * positions, and that run re-expressed in words (run + n - 1).
    *
    * Scale shape: the benchmark gram-hash set broadcasts (same bound as
    * [[flag]]); the corpus explodes to (id, pos, gram-hash) INSIDE the
    * scan stage and the broadcast join filters it to HITS before
    * anything shuffles — only contaminated gram positions (two longs a
    * row, sparse by construction) reach the per-doc aggregate. The
    * longest-consecutive-run fold runs over each doc's sorted hit
    * positions (an O(#hits) array), and the result re-joins the corpus
    * as a broadcast. The corpus itself never shuffles. */
  def spanStats(
      docs: DataFrame,
      idField: String,
      wordsField: String,
      bench: DataFrame,
      benchWordsField: String,
      n: Int = 13,
      hasher: Column => Column = c => xxhash64(c)
  ): DataFrame = {
    val bg = bench
      .select(explode(ngrams(col(benchWordsField), n)).as("__g"))
      .select(hasher(col("__g")).as("__gh"))
      .distinct()
    val hitPos = docs
      .select(col(idField), posexplode(ngrams(col(wordsField), n))
        .as(Seq("__p", "__g")))
      .select(col(idField), col("__p").cast(LongType).as("__p"),
        hasher(col("__g")).as("__gh"))
      .join(broadcast(bg), Seq("__gh"))
      .groupBy(col(idField))
      .agg(
        count(lit(1)).as("hit_grams"),
        sort_array(collect_list(col("__p"))).as("__ps"))
    // longest run of consecutive integers in the sorted position list:
    // fold state = prev*10^12 + cur*10^6 + best (positions < 10^6/doc;
    // state reaches ~10^18, so field extraction uses IntegralDivide —
    // long `/` detours through doubles past 2^53)
    val idiv = graft.functions.functions.integral_divide _
    val run = aggregate(
      col("__ps"),
      lit(0L), // prev=0 is safe: positions are 0-based, cur starts 0
      (st, p) => {
        // lastStored = lastPos + 1 (0 = none yet)
        val lastStored = idiv(st, lit(1000000000000L))
        val cur = pmod(idiv(st, lit(1000000L)), lit(1000000L))
        val best = pmod(st, lit(1000000L))
        val ncur = when(cur > 0L && p === lastStored, cur + 1L)
          .otherwise(lit(1L))
        (p + 1L) * lit(1000000000000L) + ncur * lit(1000000L) +
          greatest(best, ncur)
      },
      st => pmod(st, lit(1000000L)))
    val spans = hitPos.withColumn("max_run", run).drop("__ps")
    docs
      .select(col(idField), size(ngrams(col(wordsField), n))
        .cast(LongType).as("n_grams"))
      .join(broadcast(spans), Seq(idField), "left")
      .select(
        col(idField),
        col("n_grams"),
        coalesce(col("hit_grams"), lit(0L)).as("hit_grams"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        when(coalesce(col("max_run"), lit(0L)) > 0L,
          coalesce(col("max_run"), lit(0L)) + (n - 1))
          .otherwise(lit(0L)).as("span_words"))
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

  /** Deterministic train/val/test (or any weighted) split label: the
    * salted hash fraction of the id falls into cumulative-weight
    * buckets. Row-local, reproducible, stable under repartitioning —
    * the split every supervised pipeline needs and RNG-based splitters
    * get wrong (resplit on every run). Weights are normalized; the last
    * label absorbs rounding. */
  def splitLabel(
      id: Column,
      weights: Seq[(String, Double)],
      salt: String = "graft"
  ): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, "weights must be non-negative, sum > 0")
    val total = weights.map(_._2).sum
    val h = pmod(xxhash64(concat(id.cast(StringType), lit(salt))),
      lit(1000000000L))
    val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    weights.init.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((label, _), c), acc) => when(h < lit((c * 1e9).toLong), lit(label)).otherwise(acc)
    }
  }

  /** Engine-portable split variant (md5 hex thresholds, like
    * [[keepMd5]]): every SQL engine can replay the same assignment. */
  def splitLabelMd5(
      id: Column,
      weights: Seq[(String, Double)],
      salt: String = "graft"
  ): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, "weights must be non-negative, sum > 0")
    val total = weights.map(_._2).sum
    val h = substring(md5(concat(id.cast(StringType), lit(salt))), 1, 8)
    val cum = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    weights.init.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((label, _), c), acc) =>
        when(h < lit(hexThreshold(c)), lit(label)).otherwise(acc)
    }
  }

  /** Temperature-scaled source mixing (the mT5/XLM-R alpha-sampling rule,
    * Conneau et al. 2020 §3.1: sample sources with p_i ∝ n_i^alpha so
    * low-resource sources are up-weighted relative to their raw share).
    * As a SUBSET operator the flattened mixture is realized by keeping
    * the smallest source whole and hash-downsampling every other source
    * to rate_i = (w_i·n*) / (w*·n_i), where w_i = floor(scale·n_i^alpha)
    * and (n*, w*) belong to the anchor = the source with the fewest rows
    * (ties → lexicographically first): output shares then follow
    * p_i ∝ n_i^alpha exactly (up to the floor), and rate_anchor = 1.
    *
    * Scale shape: ONE tiny aggregate (O(#sources) rows) collects to the
    * driver; the keep decision is a row-local integer cross-multiply
    * `a·w*·n_i < 2^24·w_i·n*` over a 24-bit salted id hash, evaluated in
    * DECIMAL(38,0) so it is exact at any corpus size — zero shuffle on
    * the corpus, reproducible across runs, machines, and engines, stable
    * under repartitioning.
    *
    * Engine parity: the only floating-point step is n^alpha. With the
    * default alpha = 0.5 it is computed via `sqrt`, which IEEE 754
    * requires to be correctly rounded — bit-identical in every engine —
    * so the whole decision replays exactly. Other alphas go through
    * `pow`, whose last-ulp rounding is libm-specific: fine in
    * production, but pin alpha = 0.5 where cross-engine replay matters.
    * `portable` swaps the xxhash64 24-bit hash for an md5 twin. */
  def temperature(
      df: DataFrame,
      idField: String,
      sourceField: String,
      alpha: Double = 0.5,
      salt: String = "graft",
      scale: Long = 1000000L,
      portable: Boolean = false
  ): DataFrame = {
    val raw = df
      .groupBy(col(sourceField).cast(StringType).as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(raw.forall(_._1 != null),
      s"temperature: null values in source column '$sourceField' — " +
        "filter or fill them first (a null stratum has no stable identity)")
    val counts = raw.sortBy(_._1)
    require(counts.nonEmpty, "temperature: empty input")
    def wOf(n: Long): BigInt = {
      val p =
        if (alpha == 0.5) math.sqrt(n.toDouble)
        else math.pow(n.toDouble, alpha)
      BigInt(math.floor(scale.toDouble * p).toLong)
    }
    // w depends only on n, so the anchor needs no tie-break: any min-n
    // source yields the same (n*, w*)
    val nStar = counts.map(_._2).min
    val wStar = wOf(nStar)
    val src = col(sourceField).cast(StringType)
    val dec = (b: BigInt) => lit(b.toString).cast(DecimalType(38, 0))
    val a =
      (if (portable)
         conv(substring(md5(concat(col(idField).cast(StringType), lit(salt))),
           1, 6), 16, 10)
       else
         pmod(xxhash64(concat(col(idField).cast(StringType), lit(salt))),
           lit(16777216L))).cast(DecimalType(38, 0))
    // per-source factors ride as a when-chain of exact decimal literals
    def chain(f: (String, Long) => BigInt): Column =
      counts.tail.foldLeft(
        when(src === counts.head._1, dec(f.tupled(counts.head)))
      ) { case (acc, (s2, n2)) => acc.when(src === s2, dec(f(s2, n2))) }
    val lhs = a * chain((_, n) => wStar * n)
    val rhs = chain((_, n) => BigInt(16777216L) * wOf(n) * nStar)
    df.filter(lhs < rhs)
  }

  /** Exactly `k` rows per stratum, chosen deterministically: rank rows
    * inside each stratum by (salted id hash, id) and keep the first
    * `k`. Unlike fraction sampling this hits the quota exactly ("5k
    * docs per language for the eval set"), stays reproducible across
    * runs and repartitioning, and is one partitioned window — the
    * stratum is the partition key, so the sort is per-group, never
    * global. Hot strata with billions of rows sort-spill fine; if even
    * that is too much, pre-thin with [[keep]] (same salt) first: the
    * rank key IS keep's retained measure (`pmod(xxhash64(id‖salt),
    * 1e9)`; md5 leg: the hex prefix [[keepMd5]] thresholds), so
    * thinning removes only rows that rank BELOW the quota — the
    * composition picks the SAME survivors as long as the thinning
    * keeps ≥ k per stratum. `portable` swaps xxhash64 for the md5
    * twin. */
  def takePerStratum(
      df: DataFrame,
      idField: String,
      strataField: String,
      k: Int,
      salt: String = "graft",
      portable: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key =
      if (portable) md5(concat(col(idField).cast(StringType), lit(salt)))
      else pmod(xxhash64(concat(col(idField).cast(StringType), lit(salt))),
        lit(1000000000L))
    df.withColumn("__tps_rank",
        row_number().over(Window.partitionBy(col(strataField))
          .orderBy(key, col(idField))))
      .filter(col("__tps_rank") <= k)
      .drop("__tps_rank")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES): keep the `k` rows with the largest
    * u^(1/w), where u is a salted-hash uniform in (0,1) — rows are
    * chosen with probability proportional to `weight`, no row twice,
    * and (unlike weighted-with-replacement or per-row Bernoulli) the
    * output size is exactly k. The ordering key is the monotone-
    * equivalent ln(u)/w taken DESCENDING, quantized to a BIGINT
    * (floor ×1e9) so engines agreeing to 1e-6 produce identical ranks,
    * with the id as total-order tie-break.
    *
    * Scale shape: one global top-k — Spark compiles orderBy+limit to
    * TakeOrderedAndProject (per-partition heap of k, then a k-sized
    * merge on the driver side of the single result partition); nothing
    * but k rows ever crosses the wire. `weight` is any numeric Column
    * (quality score, token count, recency decay…); non-positive
    * weights are rejected rows (w<=0 has no sampling meaning).
    * `portable` swaps the 24-bit xxhash64 uniform for the md5-prefix
    * twin so an external engine can replay the exact sample. */
  def takeWeighted(
      df: DataFrame,
      idField: String,
      weight: Column,
      k: Int,
      salt: String = "graft",
      portable: Boolean = false
  ): DataFrame = {
    val key = aesKey(col(idField), weight, salt, portable)
    df.filter(weight > 0)
      .orderBy(key.desc, col(idField))
      .limit(k)
  }

  /** Per-stratum A-ES: the [[takeWeighted]] key ranked inside each
    * stratum (one partitioned window, stratum = partition key) — "the
    * 10k highest-quality-weighted docs per language", exact quota,
    * reproducible across runs and repartitioning. */
  def takeWeightedPerStratum(
      df: DataFrame,
      idField: String,
      strataField: String,
      weight: Column,
      k: Int,
      salt: String = "graft",
      portable: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = aesKey(col(idField), weight, salt, portable)
    df.filter(weight > 0)
      .withColumn("__aes_rank",
        row_number().over(Window.partitionBy(col(strataField))
          .orderBy(key.desc, col(idField))))
      .filter(col("__aes_rank") <= k)
      .drop("__aes_rank")
  }

  /** floor(1e9 · ln(u)/w) with u = (h24+1)/(2^24+1) ∈ (0,1); h24 is the
    * salted 24-bit id hash (xxhash64 production / md5-prefix portable —
    * the same twin pair [[temperature]] uses). */
  private def aesKey(
      id: Column,
      weight: Column,
      salt: String,
      portable: Boolean
  ): Column = {
    val h24 =
      if (portable)
        conv(substring(md5(concat(id.cast(StringType), lit(salt))), 1, 6),
          16, 10).cast(LongType)
      else pmod(xxhash64(concat(id.cast(StringType), lit(salt))),
        lit(16777216L))
    val u = (h24.cast(DoubleType) + lit(1.0)) / lit(16777217.0)
    floor(log(u) / weight.cast(DoubleType) * lit(1000000000.0)).cast(LongType)
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

/** fastText-shape quality classifier — the RedPajama-2 / DCLM / LLaMA
  * data-card staple: hashed unigram+bigram bag-of-features, mean-pooled,
  * scored by a linear head. Scoring never materializes the feature
  * vector: score = bias + meanₜ weights[h(t)] is one codegen'd fold over
  * the token array, O(tokens) per row, zero shuffle — the weight vector
  * (tiny vs the corpus) ships as a literal/broadcast. Training builds
  * the sparse mean-pooled vectors with the SAME hash arithmetic
  * (JVM-side xxhash64 replica, spec-pinned against the Column path) and
  * fits spark.ml logistic regression — a one-pass-per-iteration
  * distributed L-BFGS, no driver-side data.
  *
  * `md5Index` is the engine-portable twin (first 8 md5 hex nibbles mod
  * dim) so an oracle can replay scoring verbatim. */
object QualityClassifier {

  /** Production feature hash: non-negative xxhash64 bucket. */
  def hashIndex(token: Column, dim: Int): Column =
    pmod(xxhash64(token), lit(dim.toLong))

  /** Engine-portable twin: fold the first 8 md5 hex digits to an int,
    * mod dim (identical in any SQL dialect with md5 + string ops). */
  def md5Index(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast(LongType) % dim

  /** JVM replica of [[hashIndex]] — MUST stay in lockstep with Spark's
    * `xxhash64(col)` (XXH64 over UTF8 bytes, seed 42). */
  def jvmHashIndex(token: String, dim: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(token)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    java.lang.Math.floorMod(h, dim.toLong).toInt
  }

  private def tokensOf(words: Column, includeBigrams: Boolean): Column =
    if (includeBigrams) concat(words, Decontaminate.ngrams(words, 2))
    else words

  /** The linear score (logit) as a single fold; sigmoid(logit) is the
    * quality probability but exp() does not replay bit-identically
    * across engines, so comparisons and oracles use the logit. */
  def logit(
      words: Column,
      weights: Seq[Double],
      bias: Double,
      includeBigrams: Boolean = true,
      indexOf: Column => Column
  ): Column = {
    val toks = tokensOf(words, includeBigrams)
    val w = typedLit(weights)
    when(
      size(toks) > 0,
      lit(bias) + aggregate(
        toks,
        lit(0.0),
        (acc, t) => acc + element_at(w, (indexOf(t) + 1).cast(IntegerType))
      ) / size(toks)
    ).otherwise(lit(bias))
  }

  /** Train on (wordsField, labelField ∈ {0,1}) with distributed logistic
    * regression; returns (weights of length dim, bias) ready for
    * [[logit]] with [[hashIndex]]. */
  def train(
      df: DataFrame,
      wordsField: String,
      labelField: String,
      dim: Int = 1 << 16,
      includeBigrams: Boolean = true,
      maxIter: Int = 50,
      regParam: Double = 1e-4
  ): (Seq[Double], Double) = {
    import df.sparkSession.implicits._
    val big = includeBigrams
    val rows = df
      .select(col(labelField).cast(DoubleType), col(wordsField))
      .as[(Double, Seq[String])]
      .map { case (y, ws) =>
        val toks =
          if (big)
            ws ++ ws.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
          else ws
        val feats =
          if (toks.isEmpty) Array.empty[(Int, Double)]
          else
            toks
              .groupBy(t => jvmHashIndex(t, dim))
              .map { case (i, g) => (i, g.size.toDouble / toks.size) }
              .toArray.sortBy(_._1)
        (y, org.apache.spark.ml.linalg.Vectors.sparse(
          dim, feats.map(_._1), feats.map(_._2)))
      }
      .toDF("label", "features")
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .fit(rows)
    (model.coefficients.toArray.toSeq, model.intercept)
  }
}

/** Corpus snapshot diffing — the release-to-release accounting every
  * versioned dataset needs: which keys were added, removed, or changed
  * between snapshot A and snapshot B, without comparing full payloads
  * row by row.
  *
  * Scale shape: each side reduces to (key, xxhash64(content)) — 16-ish
  * bytes per row — BEFORE the full-outer sort-merge join, so the
  * shuffle never carries document bodies; `summary` adds one partial-agg
  * groupBy over the O(#keys) diff table. Change detection by 64-bit
  * content hash: collisions (~2⁻⁶⁴ per pair) trade exactness for never
  * shuffling payloads — the same bargain as every fingerprint op here. */
object SnapshotDiff {

  /** Per-key change row: (keyCols*, change) with change ∈
    * 'added' | 'removed' | 'changed' | 'unchanged' (the last only when
    * `includeUnchanged`). */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      includeUnchanged: Boolean = false
  ): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    // xxhash64 SKIPS null children (hash('x', null) == hash(null, 'x')),
    // so a null shifting between compare columns would read as
    // "unchanged"; appending the null bitmap as a final child
    // disambiguates every null arrangement.
    def hashed(df: DataFrame, h: String) =
      df.select(
        keyCols.map(col) :+
          xxhash64(compareCols.map(col) :+
            concat_ws(",", compareCols.map(c =>
              col(c).isNull.cast("int")): _*): _*).as(h): _*)
    val joined = hashed(oldDf, "__h_old")
      .join(hashed(newDf, "__h_new"), keyCols, "full_outer")
    val change = when(col("__h_old").isNull, lit("added"))
      .when(col("__h_new").isNull, lit("removed"))
      .when(col("__h_old") =!= col("__h_new"), lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined.select(keyCols.map(col) :+ change.as("change"): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** O(#change-kinds) release summary: (change, n). */
  def summary(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]
  ): DataFrame =
    diff(oldDf, newDf, keyCols, compareCols, includeUnchanged = true)
      .groupBy("change").agg(count(lit(1)).as("n"))
}

/** Right-to-erasure propagation (GDPR Art. 17 / CCPA deletion) across a
  * corpus release and every table DERIVED from it: the delete list is
  * tiny (user requests), but the deletion must land consistently in
  * the corpus, its signature store, its fingerprint index, and any
  * other keyed derivative — and a release needs PROOF it did. [[purge]]
  * is one broadcast anti-join per table (the delete set ships to the
  * scan; the 100-TB side never shuffles); [[audit]] emits the
  * per-table accounting row a deletion report is built from, including
  * an order-independent content checksum of the survivors (the
  * [[Sinks]] manifest discipline — two runs with different
  * partitioning produce the same sum, so the report replays).
  *
  * The delete list is deduplicated before counting so `n_deleted`
  * means rows removed, not requests honored; keys absent from a table
  * simply delete nothing there (the request may predate the shard). */
object DeletePropagation {

  /** Survivors of `df` after deleting every row whose `keyField` is in
    * `deletes.deleteKey`. Broadcast by default — delete lists are
    * request-sized; pass `broadcastHint = false` if yours is not. */
  def purge(
      df: DataFrame,
      keyField: String,
      deletes: DataFrame,
      deleteKey: String,
      broadcastHint: Boolean = true
  ): DataFrame = {
    val del0 = deletes.select(col(deleteKey).as("__dp_k")).distinct()
    val del = if (broadcastHint) broadcast(del0) else del0
    df.join(del, df(keyField) === del("__dp_k"), "left_anti")
  }

  /** One accounting row per named table:
    * (table, n_before, n_deleted, n_after, checksum_after) where
    * checksum_after is the commutative sum of `checksumOf` over the
    * survivors (order/partitioning independent). */
  def audit(
      tables: Seq[(String, DataFrame)],
      keyField: String,
      deletes: DataFrame,
      deleteKey: String,
      checksumOf: DataFrame => Column,
      broadcastHint: Boolean = true
  ): DataFrame = {
    require(tables.nonEmpty)
    tables.map { case (name, df) =>
      // one scan per table: flag doomed rows via the broadcast delete
      // set, fold counts and the survivor checksum in a single
      // partial-agg pass (no cross-join of singleton aggregates)
      val del0 = deletes.select(col(deleteKey).as("__dp_k")).distinct()
      val del = if (broadcastHint) broadcast(del0) else del0
      val flagged = df
        .join(del, df(keyField) === del("__dp_k"), "left_outer")
        .withColumn("__dp_del", col("__dp_k").isNotNull)
      flagged
        .agg(
          count(lit(1)).as("n_before"),
          sum(col("__dp_del").cast(LongType)).as("n_deleted"),
          coalesce(sum(when(!col("__dp_del"), checksumOf(flagged))), lit(0L))
            .as("checksum_after"))
        .select(
          lit(name).as("table"),
          col("n_before"),
          col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"),
          col("checksum_after"))
    }.reduce(_ unionByName _)
  }
}

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1998: a key's shard is the argmax over shards of h(shard, key), so
  * REMOVING a shard moves exactly that shard's keys and nothing else
  * (and adding one steals only the keys it now wins) — the property
  * modulo-sharding lacks (key % N reshuffles ~everything when N
  * changes) and the reason corpus exports sharded this way stay
  * diff-able across releases: [[SnapshotDiff]] on a re-sharded corpus
  * sees only real changes, not assignment churn.
  *
  * Weights are md5-window derived (the engine-replayable hash family),
  * ties break to the first shard in sorted order; assignment is one
  * codegen'd fold over a literal shard list — zero shuffle, zero
  * coordination state. */
object RendezvousShard {

  /** Shard name for `key` among `shards` (order-insensitive: the list
    * is sorted internally so the same set always assigns the same). */
  def assign(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "shards must be non-empty and unique")
    val sorted = shards.sorted
    val cands = array(sorted.map { sh =>
      struct(
        (-conv(substring(md5(concat(lit(sh), lit(":"), key.cast(StringType))),
          1, 8), 16, 10).cast(LongType)).as("negw"),
        lit(sh).as("shard"))
    }: _*)
    aggregate(
      slice(cands, 2, sorted.length - 1),
      element_at(cands, 1),
      (acc, x) =>
        when(x.getField("negw") < acc.getField("negw"), x).otherwise(acc))
      .getField("shard")
  }
}

/** Distributed INTEGER-EXACT perceptron training (Rosenblatt 1958,
  * batch variant) over hashed bag-of-words features — the only
  * classifier trainer in the catalog whose every step replays
  * bit-for-bit in SQL. [[QualityClassifier.train]] fits real logistic
  * regression (spark.ml L-BFGS, float math, spec-verified);
  * PerceptronTrainer trades model quality for full oracle
  * verifiability: weights live in Z^dim, updates are sums of signed
  * token counts, and the whole T-round trajectory is a deterministic
  * function of the corpus.
  *
  * Per round, fully distributed: margins are a row-local fold over
  * each doc's tokens against the broadcast one-row weight vector;
  * misclassified docs (y·margin <= 0) explode their tokens into ONE
  * map-side-combined groupBy(bucket) producing the O(dim) update;
  * the update merges into the weight array via a broadcast of one
  * row. Nothing but O(dim) state ever leaves the executors, and the
  * corpus is re-scanned, never shuffled. */
object PerceptronTrainer {

  /** One-row DataFrame holding the weight array after `rounds`
    * full-batch perceptron rounds. `labelField` must be +1/-1. */
  def train(
      df: DataFrame,
      wordsField: String,
      labelField: String,
      dim: Int,
      rounds: Int,
      indexOf: Column => Column
  ): DataFrame = {
    require(dim > 0 && rounds >= 1)
    val sp = df.sparkSession
    // r13: hash every token to its weight index ONCE and persist — the
    // previous formulation re-evaluated `indexOf` (an md5-fold per
    // token) TWICE PER ROUND (margin fold + delta explode), i.e.
    // 2·rounds full hashing passes plus a parquet re-read per round,
    // where one pass suffices. The hashed-index table is the exact
    // value stream the per-round math consumed before.
    val docs = df.select(
      transform(col(wordsField), t => indexOf(t).cast(LongType))
        .as("__pt_hs"),
      col(labelField).cast(LongType).as("__pt_y"))
      .persist()
    var w: DataFrame = sp.range(1).select(
      transform(sequence(lit(0), lit(dim - 1)), _ => lit(0L)).as("__pt_w"))
    for (_ <- 0 until rounds) {
      // Materialize the O(dim) weight row to the driver each round and
      // re-inject it as a literal: without this, round r's broadcast
      // plan nests every prior round's full-corpus aggregation
      // (O(rounds^2) corpus scans and unbounded plan depth).
      val wLit = typedlit(w.head().getSeq[Long](0).toIndexedSeq)
      w = sp.range(1).select(wLit.as("__pt_w"))
      val mis = docs
        .crossJoin(broadcast(w))
        .withColumn("__pt_m",
          aggregate(col("__pt_hs"), lit(0L), (acc, h) =>
            acc + element_at(col("__pt_w"), (h + 1).cast(IntegerType))))
        .filter(col("__pt_y") * col("__pt_m") <= 0)
      val delta = mis
        .select(col("__pt_y"), explode(col("__pt_hs")).as("__pt_j"))
        .groupBy(col("__pt_j"))
        .agg(sum(col("__pt_y")).as("__pt_d"))
        .agg(map_from_entries(collect_list(
          struct(col("__pt_j"), col("__pt_d")))).as("__pt_dm"))
      w = w.crossJoin(broadcast(delta))
        .select(transform(col("__pt_w"), (wi, i) =>
          wi + coalesce(element_at(col("__pt_dm"), i.cast(LongType)), lit(0L)))
          .as("__pt_w"))
    }
    // materialize the final round's weights so the persisted hash table
    // can be released before returning (callers act on a literal row)
    val finalW = typedlit(w.head().getSeq[Long](0).toIndexedSeq)
    docs.unpersist()
    sp.range(1).select(finalW.as("__pt_w"))
  }

  /** Trained weights as (j, weight) rows, j = 0..dim-1. */
  def trainWeights(
      df: DataFrame,
      wordsField: String,
      labelField: String,
      dim: Int,
      rounds: Int,
      indexOf: Column => Column
  ): DataFrame =
    train(df, wordsField, labelField, dim, rounds, indexOf)
      .select(posexplode(col("__pt_w")).as(Seq("j", "weight")))
      .select(col("j").cast(LongType).as("j"), col("weight"))

  /** Integer margin of a token array under literal trained weights —
    * the inference fold ([[QualityClassifier.logit]]'s exact-integer
    * cousin). */
  def margin(
      words: Column,
      weights: Seq[Long],
      indexOf: Column => Column
  ): Column = {
    val w = typedLit(weights)
    aggregate(words, lit(0L), (acc, t) =>
      acc + element_at(w, (indexOf(t) + 1).cast(IntegerType)))
  }
}

/** Vocabulary drift between corpus snapshots — the release-accounting
  * counterpart of [[SnapshotDiff]] at the TERM level: which words
  * gained or lost frequency share between last month's corpus and this
  * month's. A sudden top-drift list full of one template's tokens means
  * a source started dumping boilerplate; a benchmark's vocabulary
  * drifting IN means contamination. Rates are per-million integral so
  * differently-sized snapshots compare exactly.
  *
  * Scale shape: one map-side-combined groupBy(term) per snapshot, a
  * shuffled full-outer join on term, totals broadcast back as one-row
  * frames, and a TakeOrderedAndProject top-k — no global window. */
object VocabDrift {

  /** Top-k terms by |delta_ppm| between two snapshots:
    * (term, c_before, c_after, ppm_before, ppm_after, delta_ppm).
    * Terms with c_before + c_after < minCount are ignored (noise). */
  def topChanges(
      before: DataFrame,
      after: DataFrame,
      wordsField: String,
      k: Int,
      minCount: Long = 1L
  ): DataFrame = {
    import graft.functions.functions.integral_divide
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(col(wordsField)).as("term"))
        .groupBy("term").agg(count(lit(1)).as(name))
    val b = counts(before, "c_before")
    val a = counts(after, "c_after")
    val bt = b.agg(sum(col("c_before")).as("__vd_tb"))
    val at = a.agg(sum(col("c_after")).as("__vd_ta"))
    b.join(a, Seq("term"), "full_outer")
      .na.fill(0L, Seq("c_before", "c_after"))
      .filter(col("c_before") + col("c_after") >= minCount)
      .crossJoin(broadcast(bt)).crossJoin(broadcast(at))
      .select(col("term"), col("c_before"), col("c_after"),
        integral_divide(lit(1000000L) * col("c_before"), col("__vd_tb"))
          .as("ppm_before"),
        integral_divide(lit(1000000L) * col("c_after"), col("__vd_ta"))
          .as("ppm_after"))
      .withColumn("delta_ppm", col("ppm_after") - col("ppm_before"))
      .orderBy(abs(col("delta_ppm")).desc, col("term"))
      .limit(k)
  }
}

/** Inter-annotator agreement for labeled training data (Cohen 1960):
  * observed agreement corrected for the agreement two raters would
  * reach by chance from their own label marginals. The QA gate on any
  * human- or model-labeled slice before its labels train anything.
  *
  * Integer-exact formulation: with n rows, `agree` matching pairs, and
  * pe_num = Σ_label count_a(label)·count_b(label),
  * κ = (n·agree − pe_num) / (n² − pe_num); emitted ppm-scaled with an
  * explicit floor-of-double (κ can be negative — floor and truncate
  * disagree there, so BOTH engines must floor; exact below 2^53).
  *
  * Shape: one count/sum aggregate + two label-marginal aggregates
  * joined label-to-label (labels are few: broadcast); O(#labels)
  * intermediate, one output row. n² caps the exact path near n ≈ 3·10⁹
  * rows — past that, compute κ per shard and pool, or sample. */
object Agreement {

  def cohenKappa(df: DataFrame, aField: String, bField: String): DataFrame = {
    val base = df.select(
      col(aField).cast(StringType).as("__ag_a"),
      col(bField).cast(StringType).as("__ag_b"))
    val tot = base.agg(
      count(lit(1)).as("n"),
      sum((col("__ag_a") === col("__ag_b")).cast(LongType)).as("agree"))
    val ma = base.groupBy(col("__ag_a").as("lbl"))
      .agg(count(lit(1)).as("__ag_ca"))
    val mb = base.groupBy(col("__ag_b").as("lbl"))
      .agg(count(lit(1)).as("__ag_cb"))
    val pe = ma.join(mb, Seq("lbl"))
      .agg(coalesce(sum(col("__ag_ca") * col("__ag_cb")), lit(0L))
        .as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .withColumn("kappa_ppm",
        when(col("n") * col("n") === col("pe_num"), lit(null).cast(LongType))
          .otherwise(floor(
            (lit(1000000L) * (col("n") * col("agree") - col("pe_num")))
              .cast(DoubleType)
              / (col("n") * col("n") - col("pe_num"))).cast(LongType)))
      .select("n", "agree", "pe_num", "kappa_ppm")
  }
}

/** Neyman-optimal sample allocation (Neyman 1934) — the sampling-design
  * planner: given a budget of rows to draw, allocate per stratum
  * proportionally to N_h·S_h (stratum size × standard deviation), which
  * minimizes estimator variance vs plain proportional allocation. This
  * is the step BEFORE [[DeterministicSample]]: the plan says how much
  * of each stratum to draw, the sampler draws it reproducibly.
  *
  * Exactness: values floor-quantize per row, so N_h·S_h =
  * √(n_h·Σq² − (Σq)²) — ONE sqrt of an exact BIGINT, floored to milli
  * — and everything after is integer: base share = ⌊budget·w_h / W⌋,
  * leftovers by largest integer remainder (budget·w_h mod W), ties to
  * the lexicographically smaller stratum. Allocations sum to the
  * budget exactly. The apportionment runs over a one-row collected
  * array (O(#strata)) — no window, nothing scales with rows past the
  * first aggregate. */
object NeymanAllocation {

  def plan(
      df: DataFrame,
      strataField: String,
      valueField: String,
      budget: Long,
      scale: Long = 1000L
  ): DataFrame = {
    val q = floor(col(valueField).cast("double") * scale).cast(LongType)
    val st = df
      .select(col(strataField).cast(StringType).as("stratum"), q.as("__na_q"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__na_q")).as("__na_s"),
        sum(col("__na_q") * col("__na_q")).as("__na_s2"))
      .withColumn("w_milli",
        floor(lit(1000.0) * sqrt(
          (col("n_rows") * col("__na_s2") - col("__na_s") * col("__na_s"))
            .cast("double"))).cast(LongType))
    val tot = st.agg(
      coalesce(sum(col("w_milli")), lit(0L)).as("__na_W"),
      coalesce(sum(col("n_rows")), lit(0L)).as("__na_N"))
    // an all-constant corpus has W = 0 — fall back to PROPORTIONAL
    // allocation (weight = stratum size), the textbook degenerate case
    val shares = st.crossJoin(broadcast(tot))
      .withColumn("__na_wt",
        when(col("__na_W") > 0, col("w_milli")).otherwise(col("n_rows")))
      .withColumn("__na_den",
        greatest(when(col("__na_W") > 0, col("__na_W"))
          .otherwise(col("__na_N")), lit(1L)))
      .withColumn("base",
        graft.functions.functions.integral_divide(
          lit(budget) * col("__na_wt"), col("__na_den")))
      .withColumn("__na_rem",
        pmod(lit(budget) * col("__na_wt"), col("__na_den")))
    shares
      .agg(
        sum(col("base")).as("__na_sumBase"),
        sort_array(collect_list(struct(
          (-col("__na_rem")).as("nr"), col("stratum").as("st"),
          col("n_rows").as("n"), col("w_milli").as("w"),
          col("base").as("b")))).as("__na_arr"))
      .select(col("__na_sumBase"),
        posexplode(col("__na_arr")).as(Seq("__na_i", "e")))
      .select(
        col("e.st").as("stratum"),
        col("e.n").as("n_rows"),
        col("e.w").as("w_milli"),
        (col("e.b") + when(
          col("__na_i") < lit(budget) - col("__na_sumBase"), 1L)
          .otherwise(0L)).as("n_alloc"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Dataset profiling + distribution-based filtering — the "look at your
  * data before you train on it" operators: per-column summary stats in
  * one pass, and percentile-clipped filters (drop the tails of a length
  * or score distribution, the DCLM/FineWeb recipe for outlier removal).
  */
object Profile {

  /** Long-format per-column summary: (col_name, n, nulls, n_distinct,
    * min_s, max_s). ONE aggregation pass over the data; min/max are
    * stringified so mixed column types share a schema.
    *
    * `exactDistinct = true` uses COUNT(DISTINCT) — Spark plans one
    * Expand (input replicated per column), which is exact but
    * multiplies the map-side by |cols|. At corpus scale pass `false`
    * for approx_count_distinct (HyperLogLog++, relativeSD 0.01): a
    * single non-expanded pass, the profile everyone actually runs on
    * 100 TB. */
  def summarize(
      df: DataFrame,
      cols: Seq[String],
      exactDistinct: Boolean = true
  ): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.01)).as(s"__nd_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c")
      )
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__cnt_$c")).as("nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Fixed-width histogram of a numeric column: (bin_start, n) rows,
    * bin_start = floor(v / binWidth) · binWidth. ONE map-side-combined
    * groupBy whose output is #occupied-bins rows — safe to collect or
    * plot at any corpus size when binWidth is chosen sanely. */
  def histogram(df: DataFrame, c: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.filter(col(c).isNotNull)
      .groupBy((floor(col(c) / binWidth) * binWidth).cast("long").as("bin_start"))
      .agg(count(lit(1)).as("n"))
  }
}

/** Mergeable per-group distinct-count sketches (Apache DataSketches
  * HLL, via Spark's `hll_sketch_agg` family). Where
  * [[Profile.summarize]] answers "how many distinct NOW" in one pass,
  * this materializes the sketch itself: an O(2^lgK)-byte binary per
  * group that can be STORED and MERGED later — profile each daily
  * shard once, keep the (group, sketch) table, and answer
  * distinct-counts over any union of shards without ever rescanning
  * raw data. That is the only workable accounting shape at 100 TB:
  * partial aggregation combines sketches map-side, the shuffle carries
  * kilobytes per group, and re-profiling cost is proportional to the
  * NEW data only. */
object DistinctSketch {

  /** One HLL sketch per group: (groupCols*, hll binary, n_rows). */
  def build(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = 12
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Merge per-shard sketch tables and estimate distincts per group:
    * (groupCols*, n_rows, n_distinct_est). */
  def mergedEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        hll_sketch_estimate(hll_union_agg(col("hll"))).as("n_distinct_est"))
}

/** Mergeable per-group QUANTILE sketches (Apache DataSketches KLL,
  * bundled with Spark) — the quantile analog of [[DistinctSketch]]:
  * an O(k·log n)-byte binary per group that persists and merges, so
  * length/score distributions over any union of shards are answerable
  * without rescanning raw data (rank error ≈1.65% at the default
  * k=200, Karnin-Lang-Liberty 2016).
  *
  * Scale shape: [[build]] folds each PARTITION into one sketch per
  * group before anything shuffles (`mapPartitions` — the sanctioned
  * per-partition imperative case), so the shuffle carries
  * #partitions × #groups kilobyte rows, never data rows; the merge is
  * a `groupByKey.mapGroups` over those. KLL compaction flips random
  * coins, so estimates are tolerance-bounded, not bit-replayable —
  * queries must compare RANKS within the published error, as q167
  * does. */
object QuantileSketch {
  import org.apache.datasketches.kll.KllDoublesSketch
  import org.apache.datasketches.memory.Memory
  import org.apache.spark.sql.{Encoder, Encoders}

  private val rowEnc: Encoder[(String, Array[Byte], Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.BINARY, Encoders.scalaLong)

  /** One KLL sketch per group: (group, kll binary, n_rows). */
  def build(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 200
  ): DataFrame = {
    val pairs = df
      .select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast("double").as("v"))
      // quantiles are over the non-null values (a null would crash the
      // primitive Double encoder); n_rows counts sketched values
      .filter(col("v").isNotNull)
      .as[(String, Double)](
        Encoders.tuple(Encoders.STRING, Encoders.scalaDouble))
    val perPartition = pairs.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap
        .empty[String, (KllDoublesSketch, Long)]
      it.foreach { case (g, v) =>
        val (sk, n) = acc.getOrElseUpdate(
          g, (KllDoublesSketch.newHeapInstance(k), 0L))
        sk.update(v)
        acc(g) = (sk, n + 1)
      }
      acc.iterator.map { case (g, (sk, n)) => (g, sk.toByteArray, n) }
    }(rowEnc)
    mergeTables(perPartition.toDF("g", "kll", "n_rows"), k)
      .withColumnRenamed("g", groupCol)
  }

  /** Merge (g, kll, n_rows) sketch tables — e.g. daily shards — into
    * one row per group. */
  def merge(sketches: DataFrame, groupCol: String, k: Int = 200): DataFrame =
    mergeTables(
      sketches.select(col(groupCol).cast(StringType).as("g"),
        col("kll"), col("n_rows")),
      k).withColumnRenamed("g", groupCol)

  private def mergeTables(t: DataFrame, k: Int): DataFrame = {
    val ds = t.as[(String, Array[Byte], Long)](rowEnc)
    ds.groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (g, it) =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        var n = 0L
        it.foreach { case (_, bytes, rows) =>
          sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
          n += rows
        }
        (g, sk.toByteArray, n)
      }(rowEnc)
      .toDF("g", "kll", "n_rows")
  }

  /** Estimate quantiles per group from a sketch table:
    * (group, n_rows, q_<pct> double columns). */
  def quantiles(
      sketches: DataFrame,
      groupCol: String,
      probs: Seq[Double]
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val qUdf = udf { (bytes: Array[Byte]) =>
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      probs.map(p => sk.getQuantile(p)).toArray
    }
    val withQ = sketches.withColumn("__qs", qUdf(col("kll")))
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      col("__qs").getItem(i).as(s"q_${(p * 100).round}")
    }
    withQ.select(col(groupCol) +: col("n_rows") +: qCols: _*)
  }
}

/** Mergeable per-group HEAVY-HITTER sketches (Apache DataSketches
  * frequent-items / Misra-Gries) — the fourth leg of the accounting
  * layer beside [[DistinctSketch]] (how many distinct),
  * [[QuantileSketch]] (how distributed) and [[OverlapSketch]] (how
  * much shared): WHICH values dominate each group, from a bounded
  * O(maxMapSize) state that persists and merges across shards. The
  * guarantee is one-sided: every item with true count > n/maxMapSize
  * is present (no false negatives); estimates are exact while the
  * distinct count stays under the map size and order-dependent
  * (bounded-error) beyond it — queries needing replayable output
  * should stay in the exact regime, as q186 documents.
  *
  * Same shape as the KLL/theta legs: per-partition fold to one sketch
  * per group, kilobyte rows through the shuffle, mapGroups merge. */
object FrequentSketch {
  import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
  import org.apache.datasketches.common.ArrayOfStringsSerDe
  import org.apache.datasketches.memory.Memory
  import org.apache.spark.sql.{Encoder, Encoders}

  private val rowEnc: Encoder[(String, Array[Byte], Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.BINARY, Encoders.scalaLong)
  private def serde = new ArrayOfStringsSerDe()

  /** One frequent-items sketch per group: (group, fi binary, n_rows). */
  def build(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      maxMapSize: Int = 256
  ): DataFrame = {
    // DataSketches ItemsSketch requires a power-of-2 map size; validate on
    // the driver so a bad config fails fast, not mid-job on an executor
    require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
      s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")
    val pairs = df
      .select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(StringType).as("v"))
      .filter(col("v").isNotNull)
      .as[(String, String)](Encoders.tuple(Encoders.STRING, Encoders.STRING))
    val perPartition = pairs.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap
        .empty[String, (ItemsSketch[String], Long)]
      it.foreach { case (g, v) =>
        val (sk, n) = acc.getOrElseUpdate(
          g, (new ItemsSketch[String](maxMapSize), 0L))
        sk.update(v)
        acc(g) = (sk, n + 1)
      }
      acc.iterator.map { case (g, (sk, n)) => (g, sk.toByteArray(serde), n) }
    }(rowEnc)
    merge(perPartition.toDF("g", "fi", "n_rows"), "g", maxMapSize)
      .withColumnRenamed("g", groupCol)
  }

  /** Merge (group, fi, n_rows) sketch tables — shards/days — into one
    * row per group. */
  def merge(
      sketches: DataFrame,
      groupCol: String,
      maxMapSize: Int = 256
  ): DataFrame = {
    require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
      s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")
    sketches
      .select(col(groupCol).cast(StringType).as("g"), col("fi"),
        col("n_rows"))
      .as[(String, Array[Byte], Long)](rowEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (g, it) =>
        val sk = new ItemsSketch[String](maxMapSize)
        var n = 0L
        it.foreach { case (_, bytes, rows) =>
          sk.merge(ItemsSketch.getInstance(Memory.wrap(bytes), serde))
          n += rows
        }
        (g, sk.toByteArray(serde), n)
      }(rowEnc)
      .toDF("g", "fi", "n_rows")
      .withColumnRenamed("g", groupCol)
  }

  /** Top-k heavy hitters per group from a sketch table:
    * (group, item, est, rank), NO_FALSE_NEGATIVES item set, ranked by
    * (estimate desc, item). */
  def topK(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = udf { (bytes: Array[Byte]) =>
      ItemsSketch.getInstance(Memory.wrap(bytes), serde)
        .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .map(r => (r.getItem, r.getEstimate))
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("est").desc, col("item"))
    sketches
      .select(col(groupCol), explode(items(col("fi"))).as("__fi"))
      .select(col(groupCol), col("__fi._1").as("item"),
        col("__fi._2").as("est"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}

/** Cross-corpus SET-OVERLAP estimation (Apache DataSketches Theta).
  * HLL answers "how many distinct"; theta sketches additionally support
  * set INTERSECTION, so "how much of today's crawl is already in the
  * corpus" — the incremental-ingest accounting question — is answerable
  * from two stored sketch tables, with no join over raw data. Theta
  * keeps the k smallest hashes of the value set: deterministic and
  * order-independent for a given input set, exact below k entries,
  * ~1/√k relative error above.
  *
  * Same 100-TB shape as [[QuantileSketch]]: per-partition fold to one
  * sketch per group, kilobyte rows through the shuffle, mergeable
  * across shards/days. */
/** Mergeable per-group Bloom-filter tables — the MEMBERSHIP member of
  * the sketch family ([[DistinctSketch]] counts, [[QuantileSketch]]
  * ranks, [[OverlapSketch]] intersections, [[FrequentSketch]] heavy
  * hitters; this one answers "might value v be in shard S?"): build
  * once per shard, persist the O(m)-bit row per group, OR-merge across
  * any shard union, and probe with no false negatives — the shape a
  * rolling decontamination / "have we crawled this before" check needs
  * when the raw corpus is 100 TB but the filter table is kilobytes.
  *
  * Engine parity by construction, unlike the DataSketches quartet: bit
  * positions are md5-derived (`md5(i ":" value)` first 32-bit window,
  * mod m), bits pack 63 per BIGINT word (sign bit unused, the
  * [[BbitMinHash]] convention), and a set of DISTINCT positions means
  * the word is a plain SUM of powers of two — so a SQL oracle replays
  * the exact filter, not an estimate of it. Build is fully relational:
  * k-row explode, bounded `collect_set` (≤ m positions per group),
  * one partial-agg shuffle; nulls are excluded like the rest of the
  * sketch family. */
object BloomSketch {
  import graft.functions.functions.integral_divide

  /** k md5-derived bit positions of one value (array<int> in [0, m)). */
  def positions(value: org.apache.spark.sql.Column, k: Int, mBits: Int)
      : org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        pmod(
          conv(substring(md5(concat(i.cast(StringType), lit(":"), value)), 1, 8),
            16, 10).cast(org.apache.spark.sql.types.LongType),
          lit(mBits.toLong)).cast(org.apache.spark.sql.types.IntegerType))

  private def numWords(mBits: Int): Int = (mBits + 62) / 63

  /** Distinct positions → packed words (positions MUST be distinct —
    * sum equals OR only then; [[build]] guarantees it via collect_set). */
  private def wordsFromPositions(ps: org.apache.spark.sql.Column, mBits: Int)
      : org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), lit(numWords(mBits) - 1)),
      w =>
        aggregate(
          filter(ps, p => (p - pmod(p, lit(63))) / 63 === w),
          lit(0L),
          (acc, p) =>
            acc + pow(lit(2.0), pmod(p, lit(63)).cast(
              org.apache.spark.sql.types.DoubleType))
              .cast(org.apache.spark.sql.types.LongType)))

  /** One Bloom filter per group: (groupCols*, bloom array<long>,
    * n_rows). */
  def build(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      mBits: Int = 1008,
      k: Int = 3
  ): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        explode(positions(col(valueCol), k, mBits)).as("__bs_p"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        collect_set(col("__bs_p")).as("__bs_ps"),
        (count(lit(1)) / k).cast(org.apache.spark.sql.types.LongType)
          .as("n_rows"))
      .select(groupCols.map(col) :+
        wordsFromPositions(col("__bs_ps"), mBits).as("bloom") :+
        col("n_rows"): _*)

  /** OR-merge shard-built filter tables per group (input is the small
    * sketch table — O(#shards) rows per group — same contract as
    * [[DistinctSketch.mergedEstimate]]). */
  def merge(sketches: DataFrame, groupCols: Seq[String], mBits: Int = 1008)
      : DataFrame =
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(
        collect_list(col("bloom")).as("__bs_all"),
        sum(col("n_rows")).as("n_rows"))
      .select(groupCols.map(col) :+
        aggregate(
          col("__bs_all"),
          array_repeat(lit(0L), numWords(mBits)),
          (acc, b) => zip_with(acc, b, (x, y) => x.bitwiseOR(y))
        ).as("bloom") :+
        col("n_rows"): _*)

  /** Membership probe: true iff every position's bit is set (no false
    * negatives; false-positive rate ≈ (1 − e^{−kn/m})^k). */
  def mightContain(
      sketch: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      k: Int,
      mBits: Int
  ): org.apache.spark.sql.Column =
    forall(
      positions(value, k, mBits),
      p =>
        pmod(
          integral_divide(
            element_at(sketch, ((p - pmod(p, lit(63))) / 63)
              .cast(org.apache.spark.sql.types.IntegerType) + 1),
            pow(lit(2.0), pmod(p, lit(63)).cast(
              org.apache.spark.sql.types.DoubleType))
              .cast(org.apache.spark.sql.types.LongType)),
          lit(2L)) === 1L)

  /** Total set bits (the fill-ratio numerator for FPR estimates). */
  def bitsSet(sketch: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(sketch, lit(0L), (acc, w) => acc + bit_count(w).cast(
      org.apache.spark.sql.types.LongType))
}

object OverlapSketch {
  import org.apache.datasketches.theta.{CompactSketch, SetOperation, UpdateSketch}
  import org.apache.datasketches.memory.Memory
  import org.apache.spark.sql.{Encoder, Encoders}

  private val rowEnc: Encoder[(String, Array[Byte], Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.BINARY, Encoders.scalaLong)

  /** One compact theta sketch of `valueCol`'s distinct set per group:
    * (group, theta binary, n_rows). */
  def build(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lgK: Int = 12
  ): DataFrame = {
    // nulls are filtered before the fold so n_rows uniformly counts
    // SKETCHED values, matching QuantileSketch/FrequentSketch semantics
    val pairs = df
      .select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(StringType).as("v"))
      .filter(col("v").isNotNull)
      .as[(String, String)](Encoders.tuple(Encoders.STRING, Encoders.STRING))
    val perPartition = pairs.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap
        .empty[String, (UpdateSketch, Long)]
      it.foreach { case (g, v) =>
        val (sk, n) = acc.getOrElseUpdate(
          g, (UpdateSketch.builder().setLogNominalEntries(lgK).build(), 0L))
        sk.update(v)
        acc(g) = (sk, n + 1)
      }
      acc.iterator.map { case (g, (sk, n)) =>
        (g, sk.compact().toByteArray, n)
      }
    }(rowEnc)
    val ds = perPartition
    ds.groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (g, it) =>
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        var n = 0L
        it.foreach { case (_, bytes, rows) =>
          u.union(CompactSketch.wrap(Memory.wrap(bytes)))
          n += rows
        }
        (g, u.getResult.toByteArray, n)
      }(rowEnc)
      .toDF("g", "theta", "n_rows")
      .withColumnRenamed("g", groupCol)
  }

  /** Join two sketch tables on the group and estimate set sizes:
    * (group, est_a, est_b, est_union, est_intersect) — all rounded
    * BIGINT estimates. Groups present in only one table are dropped
    * (their intersection is definitionally 0). */
  def overlap(a: DataFrame, b: DataFrame, groupCol: String): DataFrame = {
    val est = udf { (ba: Array[Byte], bb: Array[Byte]) =>
      val sa = CompactSketch.wrap(Memory.wrap(ba))
      val sb = CompactSketch.wrap(Memory.wrap(bb))
      val u = SetOperation.builder().buildUnion()
      u.union(sa); u.union(sb)
      val i = SetOperation.builder().buildIntersection()
      i.intersect(sa); i.intersect(sb)
      Array(
        math.round(sa.getEstimate), math.round(sb.getEstimate),
        math.round(u.getResult.getEstimate),
        math.round(i.getResult.getEstimate))
    }
    a.select(col(groupCol), col("theta").as("__ta"))
      .join(b.select(col(groupCol), col("theta").as("__tb")), groupCol)
      .withColumn("__e", est(col("__ta"), col("__tb")))
      .select(col(groupCol),
        col("__e").getItem(0).as("est_a"),
        col("__e").getItem(1).as("est_b"),
        col("__e").getItem(2).as("est_union"),
        col("__e").getItem(3).as("est_intersect"))
  }
}

/** Keep rows whose numeric column lies between two percentiles of its
  * own distribution — e.g. drop docs below the 5th / above the 95th
  * length percentile. The thresholds are ONE tiny aggregate, broadcast
  * back over the corpus: the data is scanned twice, shuffled never. */
object QuantileClip {

  /** `exact = true` uses the exact `percentile` aggregate (per-value
    * hashmap — fine when the column's cardinality is bounded, like
    * integer lengths; oracle-replayable). `exact = false` uses
    * approx_percentile (Greenwald-Khanna sketch, accuracy 1e4) — the
    * bounded-memory path for unbounded-cardinality columns at scale. */
  def keepWithin(
      df: DataFrame,
      c: String,
      lo: Double = 0.05,
      hi: Double = 0.95,
      exact: Boolean = true
  ): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"bad percentile range [$lo,$hi]")
    val probs = array(lit(lo), lit(hi))
    val t =
      if (exact) df.agg(percentile(col(c), probs).as("__qc_t"))
      else df.agg(approx_percentile(col(c), probs, lit(10000)).as("__qc_t"))
    df.crossJoin(broadcast(t))
      .filter(col(c) >= element_at(col("__qc_t"), 1) &&
        col(c) <= element_at(col("__qc_t"), 2))
      .drop("__qc_t")
  }
}

/** Dataset-level similarity: estimated Jaccard between each pair of
  * sources (slices, snapshots, shards) from corpus-level minhash
  * signatures — the corpus-card "how much do my sources overlap"
  * number, and the cheap pre-check before a cross-source document
  * dedup pass. Broder's estimator at the SET level: each source's
  * signature is the elementwise min over the union of its docs'
  * shingle hashes (min over a multiset = min over the set, so no
  * per-source distinct is needed), and P[sig_a[j] = sig_b[j]] =
  * J(shingles_a, shingles_b).
  *
  * Scale shape: one linear shingle explode; the `numHashes` perm
  * hashes partial-aggregate map-side, so only O(#sources × numHashes)
  * rows ever shuffle; the pairwise comparison runs on that tiny melted
  * table (broadcast self-join keyed on the perm index). Nothing
  * quadratic in documents anywhere — quadratic only in #sources.
  *
  * `permHash(shingle, j)`: the permutation family — production default
  * `xxhash64(shingle, lit(j))`; pass the md5-window twin for
  * engine-portable replay. */
object SourceSimilarity {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.DoubleType

  def matrix(
      docs: DataFrame,
      sourceField: String,
      wordsField: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      permHash: (Column, Int) => Column = (sh, j) => xxhash64(sh, lit(j))
  ): DataFrame = {
    require(numHashes > 0, "numHashes must be positive")
    val exploded = docs.select(
      col(sourceField).cast(StringType).as("src"),
      explode(TextShingles.shingles(col(wordsField), shingleSize)).as("__sh")
    )
    // one pass, numHashes min-aggregates — no row blowup before the agg
    val aggs = (0 until numHashes)
      .map(j => min(permHash(col("__sh"), j)).as(s"__h$j"))
    val sigs = exploded.groupBy(col("src")).agg(aggs.head, aggs.tail: _*)
    val melted = sigs.select(
      col("src"),
      posexplode(array((0 until numHashes).map(j => col(s"__h$j")): _*))
        .as(Seq("j", "h"))
    )
    melted.alias("a")
      .join(broadcast(melted.alias("b")),
        col("a.j") === col("b.j") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(sum(when(col("a.h") === col("b.h"), 1L).otherwise(0L))
        .as("agree"))
      .withColumn("est_jaccard",
        col("agree").cast("double") / lit(numHashes.toDouble))
  }
}

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An Improved Data
  * Stream Summary: The Count-Min Sketch and its Applications") as a
  * MERGEABLE, SQL-replayable table — the point-frequency member of the
  * sketch suite ([[DistinctSketch]] cardinality, [[QuantileSketch]]
  * ranks, [[FrequentSketch]] heavy hitters with deletion-safety,
  * [[BloomSketch]] membership, [[OverlapSketch]] intersections). What
  * CM uniquely adds: (1) ε-overestimate POINT queries over the full
  * value domain, not just the top-k the frequent-items sketch retains,
  * and (2) INNER-PRODUCT estimates between two sketched multisets —
  * the classic equi-join SIZE estimator (est ≥ true size, always),
  * i.e. "how big would this shuffle be" answered from two KB-sized
  * summaries before any join runs. At 100 TB that is the planning
  * primitive: per-source sketches are built in one pass each
  * (exact-value partial agg first, so map-side combine collapses hot
  * values before any shuffle; then depth cells per DISTINCT value),
  * merge by cell-wise sum, and every downstream estimate is
  * row-local arithmetic on two arrays.
  *
  * Determinism: md5-derived cell indices (the [[BloomSketch]] hashing
  * discipline), so a DuckDB oracle replays sketches AND estimates
  * bit-for-bit. The sketch is a flat array<long> of depth·width cells
  * (cell d·width+c), summing under merge because each (d, value) maps
  * to exactly one cell. */
object CountMinSketch {

  /** Column index of `value` in depth row `d` (both may be columns). */
  def cell(value: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column,
      width: Int): org.apache.spark.sql.Column =
    pmod(
      conv(substring(md5(concat(d.cast(StringType), lit(":"),
        value.cast(StringType))), 1, 8), 16, 10).cast(LongType),
      lit(width.toLong)).cast(IntegerType)

  /** One sketch per group: (groupCols*, cm array<long> of depth·width,
    * n_rows). Null values are not sketched (uniform with the suite). */
  def build(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      width: Int = 64,
      depth: Int = 4
  ): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad shape ${depth}x$width")
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cm_c"))
    val cells = counts
      .select(
        groupCols.map(col) :+ col("__cm_c") :+
          explode(
            transform(
              sequence(lit(0), lit(depth - 1)),
              d => (d * width + cell(col(valueCol), d, width))
                .cast(IntegerType))).as("__cm_i"): _*)
      .groupBy((groupCols :+ "__cm_i").map(col): _*)
      .agg(sum(col("__cm_c")).as("__cm_s"))
    cells
      .groupBy(groupCols.map(col): _*)
      .agg(
        map_from_entries(sort_array(
          collect_list(struct(col("__cm_i"), col("__cm_s"))))).as("__cm_m"),
        // every value contributes depth cells exactly once per row
        (sum(col("__cm_s")) / depth).cast(LongType).as("n_rows"))
      .select(
        groupCols.map(col) :+
          transform(
            sequence(lit(0), lit(depth * width - 1)),
            i => coalesce(element_at(col("__cm_m"), i), lit(0L))).as("cm") :+
          col("n_rows"): _*)
  }

  /** Cell-wise-sum merge of shard-built sketch tables per group (input
    * is the small sketch table — O(#shards) rows per group). */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(
        collect_list(col("cm")).as("__cm_all"),
        sum(col("n_rows")).as("n_rows"))
      .select(
        groupCols.map(col) :+
          aggregate(
            col("__cm_all"),
            array_repeat(lit(0L),
              org.apache.spark.sql.functions.size(element_at(col("__cm_all"), 1))),
            (acc, s) => zip_with(acc, s, (x, y) => x + y),
            a => a).as("cm") :+
          col("n_rows"): _*)

  /** Point estimate: min over depth rows of the value's cell — an
    * overestimate of the true count, within ε·n with prob 1−δ for
    * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. */
  def estimate(sketch: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column, width: Int, depth: Int)
      : org.apache.spark.sql.Column =
    array_min(
      transform(
        sequence(lit(0), lit(depth - 1)),
        d => element_at(sketch, d * width + cell(value, d, width) + 1)))

  /** Inner-product (equi-join size) estimate between two sketched
    * multisets: min over depth rows of Σ_c a[d][c]·b[d][c]. Always
    * ≥ the true Σ_v count_a(v)·count_b(v). */
  def innerProduct(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, width: Int, depth: Int)
      : org.apache.spark.sql.Column =
    array_min(
      transform(
        sequence(lit(0), lit(depth - 1)),
        d =>
          aggregate(
            sequence(lit(d * width), lit((d + 1) * width - 1)),
            lit(0L),
            (acc, i) => acc + element_at(a, i + 1) * element_at(b, i + 1))))
}

/** Cross-source score calibration — make quality scores COMPARABLE
  * across sources before any global threshold touches them. A raw
  * score distribution is source-conditional (a fastText-style quality
  * 0.6 on web crawl and 0.6 on curated books mean different things);
  * thresholding the raw value silently over-keeps whichever source's
  * classifier runs hot, skewing the mixture. The standard fix (CCNet's
  * per-language buckets generalized) is rank calibration: replace each
  * score by its percentile WITHIN its source, then threshold the
  * percentile — every source keeps the same fraction, and downstream
  * temperature/quota mixing starts from a level field.
  *
  * Engine parity: the percentile is the integral
  * `(rank-1)·scale div (n-1)` (rank ties share a value, n=1 maps to
  * 0), no IEEE division anywhere, so any engine replays it exactly.
  *
  * Scale shape: one PARTITIONED window per source (each source sorts
  * only its own rows — no global sort, no driver state); the group
  * count rides the same exchange as the rank. At 100 TB a hot source
  * is one sorted shuffle partition-set, not a single machine's sort.
  */
object ScoreCalibration {

  /** Append `outputField`: the 0..`scale` integral percentile rank of
    * `scoreCol` within its `groupCols` population. */
  def percentileRank(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      outputField: String = "score_ppm",
      scale: Long = 1000000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.functions.integral_divide
    require(groupCols.nonEmpty, "calibration needs at least one group column")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val r = rank().over(byGroup.orderBy(col(scoreCol)))
    val n = count(lit(1)).over(byGroup)
    df.withColumn(
      outputField,
      when(n === 1, lit(0L)).otherwise(
        integral_divide((r.cast("long") - 1) * scale, n.cast("long") - 1)))
  }

  /** Keep the top `fraction` of every group by calibrated score — the
    * uniform-survival-rate filter raw thresholds can't give you. */
  def keepTopFraction(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      fraction: Double,
      scale: Long = 1000000L
  ): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"bad fraction $fraction")
    val cutoff = scale - (fraction * scale).toLong
    percentileRank(df, groupCols, scoreCol, "__sc_ppm", scale)
      .filter(col("__sc_ppm") >= cutoff)
      .drop("__sc_ppm")
  }
}

/** Shuffle-health diagnostics: per-partition row counts + the summary
  * numbers that tell you whether a plan's partitioning survived contact
  * with the data (max/mean skew factor, empties). Run it on the OUTPUT
  * of a suspect stage — a skew factor of 30 on a joined table is the
  * "one reducer does everything" smoking gun that motivates salting /
  * AQE skew-join before a 100-TB run burns a day on one straggler.
  * Cost: one `spark_partition_id` groupBy — O(#partitions) output. */
object PartitionSkew {

  /** (partition_id, n) — one row per non-empty partition. */
  def counts(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n"))

  /** One-row summary: n_partitions (non-empty), n_rows, max_n, min_n,
    * skew_x1000 = 1000·max/mean over non-empty partitions. */
  def summary(df: DataFrame): DataFrame =
    counts(df).agg(
      count(lit(1)).as("n_partitions"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_n"),
      min(col("n")).as("min_n"),
      (lit(1000L) * max(col("n")) * count(lit(1)) / sum(col("n")))
        .cast(LongType).as("skew_x1000"))
}

/** Corpus-statistics health check — does this corpus LOOK like natural
  * language at the distribution level? Two classic laws:
  *
  *   - Zipf: term frequency ~ rank^(-s), s ≈ 1 for natural text. A
  *     slope far below 1 means near-uniform junk (random tokens,
  *     minified code); far above means a few tokens dominate
  *     (boilerplate, template spam).
  *   - Heaps: vocabulary V(n) ~ K·n^beta over corpus prefixes,
  *     beta ≈ 0.4-0.6 for natural text. beta → 1 means vocabulary
  *     grows linearly with tokens (ids / hashes / noise); beta → 0
  *     means the corpus stopped saying new things (duplication).
  *
  * Both exponents are fit by integer OLS over integer-log2 points:
  * ilog2(x) = length(bin(x)) - 1 is exact and identical in any engine
  * with a binary-string conversion, so the fitted slopes replay
  * bit-for-bit in SQL — no floating log anywhere.
  *
  * Scale shape: ONE explode + groupBy(term) pass computes (count,
  * first_doc) per term with map-side combine; the Zipf fit sees only
  * the top-K rows (TakeOrderedAndProject, K=64); the Heaps fit sees
  * O(#buckets) rows. Rank and cumulative sums use tiny broadcast
  * self-joins instead of global windows (the catalog bans
  * unpartitioned windows). Driver state: none. */
object CorpusHealth {

  /** floor(log2(x)) for x >= 1, as `length(bin(x)) - 1`. */
  def ilog2(x: Column): Column =
    (length(bin(x.cast(LongType))) - 1).cast(LongType)

  /** One-row corpus health summary over (idField, wordsField):
    * `n_terms`, `n_tokens`, `zipf_neg_slope_milli` (1000·s, positive),
    * `heaps_beta_milli` (1000·beta). */
  def zipfHeaps(
      df: DataFrame,
      idField: String,
      wordsField: String,
      topK: Int = 64,
      buckets: Int = 10
  ): DataFrame = {
    val terms = df
      .select(col(idField).as("__ch_id"), explode(col(wordsField)).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("c"), min(col("__ch_id")).as("fd"))

    // ---- Zipf leg: integer OLS of ilog2(count) on ilog2(rank), top-K
    val top = terms.select("term", "c").orderBy(col("c").desc, col("term"))
      .limit(topK)
    val topB = top.select(col("term").as("bterm"), col("c").as("bc"))
    val ranked = top
      .join(broadcast(topB),
        col("bc") > col("c") ||
          (col("bc") === col("c") && col("bterm") < col("term")),
        "left")
      .groupBy("term", "c")
      .agg((count(col("bterm")) + 1).as("r"))
      .select(ilog2(col("r")).as("x"), ilog2(col("c")).as("y"))
    val zipf = ranked
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(expr(
        "(sx * sy - n * sxy) * 1000 div (n * sxx - sx * sx)")
        .as("zipf_neg_slope_milli"))

    // ---- Heaps leg: cumulative (tokens, vocab) at id-order prefixes
    val mx = df.agg((max(col(idField)) + 1).as("__ch_n"))
    val bucketed = df
      .crossJoin(broadcast(mx))
      .select(
        least(lit(buckets),
          floor(col(idField) * buckets / col("__ch_n")).cast(LongType) + 1)
          .as("b"),
        size(col(wordsField)).cast(LongType).as("t"))
    val tokB = bucketed.groupBy("b").agg(sum(col("t")).as("toks"))
    val vocB = terms
      .crossJoin(broadcast(mx))
      .select(least(lit(buckets),
        floor(col("fd") * buckets / col("__ch_n")).cast(LongType) + 1).as("b"))
      .groupBy("b").agg(count(lit(1)).as("v"))
    val cumSrc = tokB.select(col("b"), col("toks"))
      .join(broadcast(vocB.select(col("b").as("vb"), col("v"))),
        col("vb") <= col("b"), "left")
    val cumTok = tokB.select(col("b").as("tb2"), col("toks").as("toks2"))
    val cum = cumSrc
      .groupBy("b", "toks")
      .agg(sum(col("v")).as("vc"))
      .join(broadcast(cumTok), col("tb2") <= col("b"))
      .groupBy("b", "vc")
      .agg(sum(col("toks2")).as("tc"))
      .select(ilog2(col("tc")).as("x"), ilog2(col("vc")).as("y"))
    val heaps = cum
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(expr(
        "(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)")
        .as("heaps_beta_milli"))

    val totals = terms.agg(
      count(lit(1)).as("n_terms"),
      sum(col("c")).as("n_tokens"))

    totals.crossJoin(broadcast(zipf)).crossJoin(broadcast(heaps))
      .select("n_terms", "n_tokens", "zipf_neg_slope_milli",
        "heaps_beta_milli")
  }
}

/** Ingest-rate anomaly detection — pipeline observability over an
  * event/ingest log: per-key hourly volumes against a trailing-window
  * baseline, flagging spikes (a crawler gone rogue, a source suddenly
  * dumping duplicates) BEFORE they poison downstream dedup and mixing
  * stages. Integer ratio = 1000·n·prev_n / prev_sum, so the report is
  * SQL-replayable; the window is PARTITIONED by key (never global) and
  * runs over the O(#keys·#hours) count table, not the raw events. */
object RateAnomaly {

  /** Per (key, hour): n, trailing prev_n/prev_sum, ratio_milli
    * (1000 = at baseline), spike flag. First hours with an empty
    * trailing window report null ratio, spike=false. */
  def hourlySpikes(
      df: DataFrame,
      keyField: String,
      tsField: String,
      trailing: Int = 6,
      spikeRatioMilli: Long = 3000L
  ): DataFrame = {
    import graft.functions.functions.integral_divide
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(col(keyField).as("key"),
        date_trunc("hour", col(tsField)).as("hour"))
      .agg(count(lit(1)).as("n"))
    spikesFromCounts(counts, trailing, spikeRatioMilli)
  }

  /** Same scoring over a PRE-AGGREGATED (key, hour, n) table — the
    * production split: hourly counts accumulate incrementally (e.g.
    * from a Structured Streaming windowed aggregation into a store),
    * and the anomaly report is a cheap batch pass over that tiny
    * table. Batch/stream parity is pinned by spec. */
  def spikesFromCounts(
      counts: DataFrame,
      trailing: Int = 6,
      spikeRatioMilli: Long = 3000L
  ): DataFrame = {
    import graft.functions.functions.integral_divide
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("hour")
      .rowsBetween(-trailing, -1)
    counts
      .withColumn("prev_n", count(lit(1)).over(w))
      .withColumn("prev_sum", sum(col("n")).over(w))
      .withColumn("ratio_milli",
        when(col("prev_sum") > 0,
          integral_divide(lit(1000L) * col("n") * col("prev_n"),
            col("prev_sum"))))
      .withColumn("spike",
        coalesce(col("ratio_milli") >= spikeRatioMilli, lit(false)))
  }
}

/** Histogram drift between two slices (epochs, snapshots, sources) as
  * EXACT total-variation distance: TV = ½·Σ_b |ca/na − cb/nb| =
  * Σ_b |ca·nb − cb·na| / (2·na·nb) — the numerator is an
  * order-independent BIGINT sum, the single division happens once at
  * the end, so the ppm result replays exactly on any engine (the
  * ln-based PSI deliberately does not — its logs are not
  * cross-engine-exact). The per-bucket contribution identifies WHAT
  * drifted, not just how much.
  *
  * Shape: one bucket-keyed count aggregate (partial map-side), two
  * scalar totals broadcast back, one O(#buckets) reduction. Nothing
  * scales with rows except the first count. */
object HistogramDrift {

  /** One row: (na, nb, n_buckets, tv_ppm, top_bucket,
    * top_contrib_ppm). `sliceField` must take exactly the two values
    * `a` and `b`; other rows are ignored. */
  def totalVariation(
      df: DataFrame,
      sliceField: String,
      bucketField: String,
      a: String,
      b: String
  ): DataFrame = {
    val counts = df
      .filter(col(sliceField).cast(StringType).isin(a, b))
      .groupBy(col(bucketField).cast(LongType).as("bucket"))
      .agg(
        sum((col(sliceField).cast(StringType) === a).cast(LongType)).as("ca"),
        sum((col(sliceField).cast(StringType) === b).cast(LongType)).as("cb"))
    val tot = counts.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.crossJoin(broadcast(tot))
      .withColumn("__hd_num", abs(col("ca") * col("nb") - col("cb") * col("na")))
      .groupBy("na", "nb")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("__hd_num")).as("__hd_sum"),
        max(struct(col("__hd_num").as("c"), col("bucket").as("b")))
          .as("__hd_top"))
      .select(
        col("na"), col("nb"), col("n_buckets"),
        floor((lit(1000000L) * col("__hd_sum")).cast("double")
          / (lit(2L) * col("na") * col("nb"))).cast(LongType).as("tv_ppm"),
        col("__hd_top.b").as("top_bucket"),
        floor((lit(1000000L) * col("__hd_top.c")).cast("double")
          / (lit(2L) * col("na") * col("nb"))).cast(LongType)
          .as("top_contrib_ppm"))
  }
}

/** Kolmogorov–Smirnov drift on bucketed histograms — [[HistogramDrift]]'s
  * cumulative companion: TV sees total mass moved, KS sees the single
  * worst cumulative split point (a small shift applied to EVERY bucket
  * barely moves TV but walks KS up). Exact integral form: at each
  * bucket boundary the statistic is |CA·nb − CB·na| with BIGINT
  * cumulative counts; one division at the end. The cumulative scan is
  * a fold over the SORTED O(#buckets) array (no window — bucket tables
  * are release-report sized by construction). */
object KsDrift {

  /** One row: (na, nb, n_buckets, ks_ppm, ks_bucket) — ks_bucket is
    * the boundary achieving the max. */
  def ksOnBuckets(
      df: DataFrame,
      sliceField: String,
      bucketField: String,
      a: String,
      b: String
  ): DataFrame = {
    val counts = df
      .filter(col(sliceField).cast(StringType).isin(a, b))
      .groupBy(col(bucketField).cast(LongType).as("bucket"))
      .agg(
        sum((col(sliceField).cast(StringType) === a).cast(LongType)).as("ca"),
        sum((col(sliceField).cast(StringType) === b).cast(LongType)).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.crossJoin(broadcast(tot))
      .groupBy("na", "nb")
      .agg(
        count(lit(1)).as("n_buckets"),
        sort_array(collect_list(struct(col("bucket"), col("ca"), col("cb"))))
          .as("__ks_arr"))
      .withColumn("__ks_f",
        aggregate(
          col("__ks_arr"),
          transform(sequence(lit(1), lit(4)), _ => lit(0L)), // [cumA,cumB,best,bucket]
          (st, e) => {
            val cumA = element_at(st, 1) + e("ca")
            val cumB = element_at(st, 2) + e("cb")
            val d = abs(cumA * col("nb") - cumB * col("na"))
            array(cumA, cumB,
              greatest(element_at(st, 3), d),
              when(d > element_at(st, 3), e("bucket"))
                .otherwise(element_at(st, 4)))
          }))
      .select(col("na"), col("nb"), col("n_buckets"),
        floor((lit(1000000L) * element_at(col("__ks_f"), 3)).cast("double")
          / (col("na") * col("nb"))).cast(LongType).as("ks_ppm"),
        element_at(col("__ks_f"), 4).as("ks_bucket"))
  }
}

/** Horvitz–Thompson correction — corpus statistics from a WEIGHTED
  * sample: every sampled row carries its inclusion probability (ppm),
  * and the estimator of the population count is Σ 1/p over sampled
  * rows. Emitted milli-scaled with the floor applied PER ROW, so the
  * sum stays order-independent and engine-exact (documented downward
  * bias < n_sampled/1000 milli-units — negligible against sampling
  * noise). This is what makes post-sampling release reports honest:
  * stats computed on a temperature-mixed sample, corrected back to
  * corpus scale.
  *
  * Rows whose inclusion probability is null or ≤ 0 are INVALID (an
  * HT weight for them is undefined): they contribute nothing to
  * `est_count_milli` and are surfaced in `n_invalid` instead of being
  * silently dropped — a non-zero `n_invalid` means the sampler's
  * bookkeeping is broken upstream and the estimate is a lower bound. */
object HtEstimate {

  def totals(
      df: DataFrame,
      probPpmField: String,
      groupField: String
  ): DataFrame = {
    val p = col(probPpmField)
    df.groupBy(col(groupField).as("grp"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(when(p.isNull || p <= 0L, 1L).otherwise(0L)).as("n_invalid"),
        sum(when(p > 0L,
          graft.functions.functions.integral_divide(lit(1000000000L), p))
          .otherwise(lit(0L))).as("est_count_milli"))
  }
}

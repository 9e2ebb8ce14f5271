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

/** Distributed BM25 relevance scoring of every document against a fixed
  * query term set (Robertson & Zaragoza 2009) — the retrieval-style
  * selection primitive ("rank a 100 TB corpus by relevance to a topic
  * probe"). Two stages, both corpus-scale-safe:
  *
  *   1. corpus statistics: N, total length, and per-query-term document
  *      frequencies — ONE aggregate whose output is O(#query terms),
  *      collected and re-inlined as literals (the [[DsirScore]]
  *      literal-inline pattern; query sets are tiny);
  *   2. scoring: a row-local fold over each doc's words — zero shuffle,
  *      scan-stage, codegen'd.
  *
  * Engine parity: `ln`/doubles don't hash-match across engines, so the
  * whole formula is BIGINT arithmetic. With k1 = 1.2, b = 0.75 and
  * integer idf `((N − df + 1)·scale) div (df + 1)` (the +1 floor keeps
  * it positive, same monotonicity as the log idf), each matched term
  * contributes
  *   `(idf · tf · 2200 · avgdl) div (1000·tf·avgdl + 300·avgdl + 900·dl)`
  * — numerator and denominator of the classical term both multiplied by
  * `1000·avgdl`, so the ratio is exact before the single final floor. */
object Bm25 {

  final case class Stats(
      nDocs: Long,
      avgDl: Long,
      idf: Map[String, Long]
  )

  /** Corpus stats for `terms`: one pass over the words column. `avgdl`
    * is integer-floored (≥ 1). */
  def stats(
      docs: DataFrame,
      wordsField: String,
      terms: Seq[String],
      scale: Long = 1000000L
  ): Stats = {
    val w = col(wordsField)
    val probes = terms.distinct.sorted
    val aggs =
      Seq(count(lit(1)).as("n"), sum(size(w).cast("long")).as("len")) ++
        probes.zipWithIndex.map { case (t, i) =>
          sum(array_contains(w, t).cast("long")).as(s"df_$i")
        }
    val r = docs.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getLong(0)
    val len = Option(r.get(1)).fold(0L)(_ => r.getLong(1))
    val idf = probes.zipWithIndex.map { case (t, i) =>
      val df = r.getLong(2 + i)
      t -> ((n - df + 1L) * scale) / (df + 1L)
    }.toMap
    Stats(n, math.max(1L, if (n > 0) len / n else 1L), idf)
  }

  // true BIGINT division: see graft.functions.functions.integral_divide
  private def idiv(a: Column, b: Column): Column =
    graft.functions.functions.integral_divide(a, b)

  /** Row-local BM25 score (scaled BIGINT) of a words array given
    * pre-computed [[Stats]]. tf per term via a filter-count fold; the
    * tiny idf map rides as a literal map. */
  def score(words: Column, st: Stats): Column = {
    val dl = size(words).cast("long")
    st.idf.toSeq.sortBy(_._1).map { case (t, idf) =>
      val tf = size(filter(words, x => x === t)).cast("long")
      val num = lit(idf) * tf * lit(2200L) * lit(st.avgDl)
      val den = lit(1000L) * tf * lit(st.avgDl) + lit(300L * st.avgDl) + lit(900L) * dl
      when(tf > 0, idiv(num, den)).otherwise(lit(0L))
    }.reduceOption(_ + _).getOrElse(lit(0L))
  }
}

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
  * combine heterogeneous rankers (BM25 + dense cosine + authority) into
  * one list without score calibration: each run contributes
  * `scale div (k + rank)` per (query, doc) and contributions sum.
  * All-BIGINT (the classic 1/(k+r) floats don't replay across engines;
  * the integral form preserves the ordering RRF actually depends on).
  *
  * Scale shape: runs union (no join fan-out), one partial-aggregated
  * groupBy on (query, doc), and the final per-query ordering is a
  * PARTITIONED window — candidate lists are post-retrieval (top-k per
  * query), so partitions are small by construction. */
object RrfFusion {

  /** Fuse ranked runs — each a DataFrame of (queryField, docField,
    * rankField) with rank 1-based — into (query, doc, rrf_scaled, rank)
    * with ties broken on doc id. */
  def fuse(
      runs: Seq[DataFrame],
      queryField: String = "query_id",
      docField: String = "doc_id",
      rankField: String = "rank",
      k: Long = 60L,
      scale: Long = 1000000000L
  ): DataFrame = {
    require(runs.nonEmpty, "RrfFusion.fuse: no runs")
    import org.apache.spark.sql.expressions.Window
    val contrib = runs
      .map(_.select(
        col(queryField), col(docField),
        graft.functions.functions.integral_divide(
          lit(scale), lit(k) + col(rankField).cast("long")).as("__rrf_c")))
      .reduce(_ unionByName _)
    contrib
      .groupBy(col(queryField), col(docField))
      .agg(sum(col("__rrf_c")).as("rrf_scaled"))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col(queryField))
            .orderBy(col("rrf_scaled").desc, col(docField))).cast("long"))
  }
}

/** Contrastive training-pair generation — the engine preparing the
  * ENCODER'S data (the embedder that later powers SemDeDup / ANN /
  * bitext mining): positives are caller-supplied near-dup pairs (from
  * any of the dedup candidate generators), negatives are deterministic
  * hash-neighbor pairings — each id pairs with the NEXT id in
  * salted-md5 order within its hash bucket. That gives collision-free,
  * reproducible pseudo-random negatives with a PARTITIONED window (no
  * global-sort funnel), and an anti-join removes any negative that is
  * accidentally a positive. Output: (id_a, id_b, label) with label
  * 1 = positive, 0 = negative, pairs id_a < id_b. */
object ContrastivePairs {

  def build(
      ids: DataFrame,
      idField: String,
      positives: DataFrame, // (id_a, id_b)
      salt: String = "neg",
      buckets: Int = 64
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val h = md5(concat(col(idField).cast("string"), lit(salt)))
    val ranked = ids.select(
      col(idField).as("__cp_id"),
      (conv(substring(h, 1, 4), 16, 10).cast("long") % buckets).as("__cp_b"),
      h.as("__cp_h"))
    val w = Window.partitionBy(col("__cp_b")).orderBy(col("__cp_h"), col("__cp_id"))
    val canonPos = positives.select(
      least(col("id_a"), col("id_b")).as("id_a"),
      greatest(col("id_a"), col("id_b")).as("id_b"))
    val negs = ranked
      .withColumn("__cp_n", lead(col("__cp_id"), 1).over(w))
      .filter(col("__cp_n").isNotNull)
      .select(
        least(col("__cp_id"), col("__cp_n")).as("id_a"),
        greatest(col("__cp_id"), col("__cp_n")).as("id_b"))
      .join(canonPos, Seq("id_a", "id_b"), "left_anti")
      .withColumn("label", lit(0L))
    canonPos.withColumn("label", lit(1L)).unionByName(negs)
  }
}

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-first
  * traversal, the 2-approximation for k-center) — DIVERSITY-maximizing
  * subset selection over an embedding column: repeatedly add the point
  * whose maximum similarity to the already-selected set is smallest.
  * The selection-family complement to [[DsirScore]] (match a target
  * distribution) and SemDeDup (drop redundancy): k-center PICKS the
  * spanning exemplars — seed sets for active learning, eval-set
  * construction, prototype picking per cluster.
  *
  * Scale shape: the selected set is O(k·dim) DRIVER state shipped as
  * literal arrays (the ivfTopK pattern); each round is one
  * partial-aggregated min-of-struct pass over the corpus — no shuffle
  * of rows, no window, k passes total. Per-selected cosines are
  * sequential left-folds floor-scaled to BIGINT ppm BEFORE the max and
  * argmin, so the entire greedy trajectory replays exactly in any
  * engine (floor is monotone, so flooring before the max changes
  * nothing).
  */
object CoresetSelect {

  /** Returns (round, id, max_sim_ppm): round 0 is the seed (ppm 0 by
    * convention), round r > 0 the point minimizing max cosine-ppm to
    * rounds < r (ties by min id). `seedId` defaults to the min id. */
  def greedyKCenter(
      df: DataFrame,
      idField: String,
      embField: String,
      k: Int,
      seedId: Option[Long] = None
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val base = df.select(
      col(idField).cast("long").as("__cs_id"),
      col(embField).cast(ArrayType(DoubleType)).as("__cs_v"))
    val seed = seedId.getOrElse(
      base.agg(min(col("__cs_id"))).head().getLong(0))
    def vecOf(id: Long): Seq[Double] =
      base.filter(col("__cs_id") === id).head().getSeq[Double](1)

    def cosPpm(sel: Seq[Double]): Column = {
      // r13: native dot kernel — bit-identical fold (see DotProductExpr);
      // the (1e6·dot)/(√·√) ordering around it is untouched, so the
      // floor-scaled ppm (and hence the greedy trajectory) replays exactly
      def dot(a: Column, b: Column): Column =
        graft.functions.functions.dot_product(a, b)
      val w = typedlit(sel)
      floor(
        lit(1e6) * dot(col("__cs_v"), w) /
          (sqrt(dot(col("__cs_v"), col("__cs_v"))) * sqrt(dot(w, w))))
        .cast("long")
    }

    val selected = scala.collection.mutable.ArrayBuffer((seed, 0L, vecOf(seed)))
    var r = 1
    var exhausted = false
    while (r < k && !exhausted) {
      val sims = selected.map { case (_, _, v) => cosPpm(v.toIndexedSeq) }
      val maxSim = sims.reduce((a, b) => greatest(a, b))
      val next = base
        .filter(!col("__cs_id").isin(selected.map(_._1).toSeq: _*))
        .agg(min(struct(maxSim.as("m"), col("__cs_id").as("i"))))
        .head().getStruct(0)
      // min(...) over an EMPTY remainder yields a null aggregate row:
      // k exceeded the row count, so stop with what we have rather
      // than throwing an opaque NPE.
      if (next == null) exhausted = true
      else {
        val nid = next.getLong(1)
        selected += ((nid, next.getLong(0), vecOf(nid)))
        r += 1
      }
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, m, _), i) => (i, id, m) }
      .toDF("round", idField, "max_sim_ppm")
  }
}

package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding storage/compression ops for 100 TB-scale vector corpora.
  *
  * Per-vector min-max uint8 quantization: `q_k = clamp(floor((x_k − lo) ·
  * 255 / (hi − lo)), 0, 255)` with `(lo, hi)` kept per vector — a 4×
  * storage cut (plus better downstream shuffle/scan volume) at ≤
  * (hi−lo)/255 ≈ 0.4 % absolute reconstruction error per dimension,
  * the standard trick for web-scale ANN indexes. Everything is a pure
  * Column expression (row-local, codegen'd, no UDF), and the arithmetic
  * is fixed-order IEEE so results replay bit-identically in any engine.
  */
object Embeddings {

  /** array<float|double> → struct(q: array<int> in [0,255], lo, hi). */
  def quantize(emb: Column): Column = {
    val e = emb.cast(ArrayType(DoubleType))
    val lo = array_min(e)
    val hi = array_max(e)
    struct(
      transform(
        e,
        x =>
          when(hi === lo, lit(0))
            .otherwise(
              least(floor((x - lo) * 255.0 / (hi - lo)), lit(255.0))
                .cast(IntegerType))
      ).as("q"),
      lo.as("lo"),
      hi.as("hi")
    )
  }

  /** struct(q, lo, hi) → array<double>: `lo + q · (hi − lo) / 255`. */
  def dequantize(qs: Column): Column = {
    val lo = qs.getField("lo")
    val hi = qs.getField("hi")
    transform(qs.getField("q"), q => lo + q * (hi - lo) / 255.0)
  }
}

/** Replace `embField` with its uint8-quantized struct (or write to
  * `outputField` when given). */
final case class QuantizeEmbeddings(
    embField: String,
    outputField: Option[String] = None
) extends Mapper {
  private def dest = outputField.getOrElse(embField)
  override def inputFields: Seq[String] = Seq(embField)
  override def outputFields: Seq[String] = Seq(dest)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(dest, Embeddings.quantize(col(embField)))
}

/** Inverse of [[QuantizeEmbeddings]]: struct column → array<double>. */
final case class DequantizeEmbeddings(
    quantField: String,
    outputField: Option[String] = None
) extends Mapper {
  private def dest = outputField.getOrElse(quantField)
  override def inputFields: Seq[String] = Seq(quantField)
  override def outputFields: Seq[String] = Seq(dest)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(dest, Embeddings.dequantize(col(quantField)))
}

/** Per-group embedding centroids and the group-to-group cosine map —
  * the "source atlas": how close one source's (or cluster's, or
  * snapshot's) embedding mass sits to another's, for mix design,
  * drift tracking between releases, and spotting a crawl that is a
  * rebranded copy of another (the embedding-space cousin of the
  * vocabulary-based source-similarity matrix).
  *
  * Exactness: per-row values floor-quantize to integers FIRST, so the
  * per-dim sums are order-independent BIGINTs (doubles never sum
  * across rows); cosine is scale-invariant, so the SUM vector stands
  * in for the mean with no division. The final cosine runs on
  * integer-valued doubles (exact below 2^53) through the sequential
  * fold both engines replay bit-for-bit.
  *
  * Shape: one posexplode + (group, dim)-keyed partial-aggregated sum
  * (#groups·dim rows), one re-assembly per group, and an O(#groups²)
  * pairwise join over a broadcast-sized table. The corpus is touched
  * once; nothing about it shuffles except the quantized (group, dim,
  * value) triples.
  */
object CentroidMap {

  /** (grp, n, vec): per-group row count and dim-ordered array of
    * quantized per-dim sums (as exact doubles, ready for cosine). */
  def centroidSums(
      df: DataFrame,
      groupField: String,
      embField: String,
      scale: Long = 1000L
  ): DataFrame =
    df.select(col(groupField).as("grp"),
        posexplode(col(embField).cast(ArrayType(DoubleType)))
          .as(Seq("__cm_p", "__cm_x")))
      .groupBy("grp", "__cm_p")
      .agg(sum(floor(col("__cm_x") * scale).cast(LongType)).as("__cm_s"),
        count(lit(1)).as("__cm_c"))
      .groupBy("grp")
      .agg(
        max(col("__cm_c")).as("n"),
        transform(
          sort_array(collect_list(struct(col("__cm_p"), col("__cm_s")))),
          p => p("__cm_s").cast(DoubleType)).as("vec"))

  /** Pairwise cosine (ppm) between group centroids; grp_a < grp_b. */
  def pairwise(
      df: DataFrame,
      groupField: String,
      embField: String,
      scale: Long = 1000L
  ): DataFrame = {
    val cs = centroidSums(df, groupField, embField, scale)
    val dot = CosineKnn.dot _
    cs.as("l").join(broadcast(cs.as("r")),
        col("l.grp") < col("r.grp"))
      .select(
        col("l.grp").as("grp_a"), col("r.grp").as("grp_b"),
        col("l.n").as("n_a"), col("r.n").as("n_b"),
        when(
          dot(col("l.vec"), col("l.vec")) > 0.0 &&
            dot(col("r.vec"), col("r.vec")) > 0.0,
          floor(lit(1000000.0) * CosineKnn.cosine(col("l.vec"), col("r.vec")))
            .cast(LongType)).as("cos_ppm"))
  }
}

/** Cluster medoid selection — the most-central MEMBER of each cluster
  * (argmax of summed cosine to its cluster-mates): the exemplar a
  * catalog shows for a near-dup cluster, the doc kept when "keep the
  * most representative" beats quality heuristics, the label candidate
  * for a topic cluster. Unlike a centroid it is a real row, so
  * everything attached to it (text, url, license) comes along.
  *
  * Exactness: per-pair cosines floor to ppm BEFORE summing (the
  * order-independent-integer rule), so the argmax is engine-exact;
  * ties break to the lower id. Shape: members above `cap` per cluster
  * are deterministically down-sampled (salted-hash rank — the
  * MinHashLSH hot-bucket discipline) so the within-cluster pairwise
  * join is bounded by cap² per cluster; pair rows carry (cluster, id,
  * ppm) longs only. `portable` swaps the cap's xxhash64 rank order
  * for the first-8-md5-hex twin (the [[DeterministicSample]]
  * discipline) so a replaying engine reproduces the SAME down-sample
  * — without it an oracle silently pairs everything once a cluster
  * outgrows the cap while this side caps (SF-dependent divergence).
  */
object Medoid {

  def perCluster(
      df: DataFrame,
      idField: String,
      embField: String,
      clusterField: String,
      cap: Int = 1000,
      portable: Boolean = false
  ): DataFrame = {
    val base = df.select(
      col(clusterField).cast(LongType).as("cluster"),
      col(idField).cast(LongType).as("__md_id"),
      col(embField).cast(ArrayType(DoubleType)).as("__md_e"))
    val capKey = concat_ws("|", col("cluster"), col("__md_id"))
    val capHash: Column =
      if (portable) substring(md5(capKey), 1, 8) else xxhash64(capKey)
    val capped = base
      .withColumn("__md_rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster"))
            .orderBy(capHash, col("__md_id"))))
      .filter(col("__md_rn") <= cap)
      .drop("__md_rn")
    val pairs = capped.as("l")
      .join(capped.as("r"),
        col("l.cluster") === col("r.cluster") &&
          col("l.__md_id") =!= col("r.__md_id"))
      .select(col("l.cluster").as("cluster"),
        col("l.__md_id").as("__md_id"),
        floor(lit(1000000.0) *
          CosineKnn.cosine(col("l.__md_e"), col("r.__md_e")))
          .cast(LongType).as("__md_c"))
    val scored = capped.select("cluster", "__md_id")
      .join(
        pairs.groupBy("cluster", "__md_id")
          .agg(sum(col("__md_c")).as("__md_s")),
        Seq("cluster", "__md_id"), "left")
      .withColumn("__md_s", coalesce(col("__md_s"), lit(0L)))
    scored
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        min(struct((-col("__md_s")).as("ns"), col("__md_id").as("i")))
          .as("__md_b"))
      .select(col("cluster"),
        col("__md_b.i").as("medoid_id"),
        (-col("__md_b.ns")).as("sim_sum_ppm"),
        col("n_members"))
  }
}

/** Label-noise detection by neighborhood disagreement ("confident
  * learning lite"): a labeled vector whose k nearest neighbors mostly
  * carry a DIFFERENT label is either mislabeled or sits on a class
  * boundary — either way it is what a labeled-slice audit wants on
  * top of the queue. Output per vector: its label, the neighborhood
  * majority, the agreement count, and the flag.
  *
  * Exactness: per-pair cosines floor to ppm before ranking (ties by
  * neighbor id), so the k-set and the vote are engine-exact. Shape:
  * this is the BRUTE pairwise baseline (the q93/q86 discipline) —
  * audit-grade for a labeled SLICE (labeled data is the small
  * fraction); at corpus scale route the same vote through the IVF/LSH
  * candidate front ends and this operator's ranking+vote unchanged.
  */
object LabelNoise {

  def knnDisagreement(
      df: DataFrame,
      idField: String,
      embField: String,
      labelField: String,
      k: Int = 5
  ): DataFrame = {
    val base = df.select(
      col(idField).cast(LongType).as("__ln_id"),
      col(embField).cast(ArrayType(DoubleType)).as("__ln_e"),
      col(labelField).cast(LongType).as("__ln_y"))
    val pairs = base.as("l")
      .join(broadcast(base.as("r")), col("l.__ln_id") =!= col("r.__ln_id"))
      .select(
        col("l.__ln_id").as("__ln_id"), col("l.__ln_y").as("__ln_y"),
        col("r.__ln_id").as("__ln_nid"), col("r.__ln_y").as("__ln_ny"),
        floor(lit(1000000.0) *
          CosineKnn.cosine(col("l.__ln_e"), col("r.__ln_e")))
          .cast(LongType).as("__ln_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__ln_id")
      .orderBy(col("__ln_c").desc, col("__ln_nid"))
    val top = pairs
      .withColumn("__ln_rn", row_number().over(w))
      .filter(col("__ln_rn") <= k)
    val votes = top
      .groupBy("__ln_id", "__ln_y", "__ln_ny")
      .agg(count(lit(1)).as("__ln_v"))
    // majority = most votes, ties to the SMALLER label (deterministic);
    // flagged only on STRICT disagreement (majority outvotes the own-label
    // neighbors) — a tie is boundary evidence, not noise evidence
    votes
      .groupBy(col("__ln_id").as(idField), col("__ln_y").as("label"))
      .agg(
        min(struct((-col("__ln_v")).as("nv"), col("__ln_ny").as("l")))
          .as("__ln_m"),
        coalesce(sum(when(col("__ln_ny") === col("__ln_y"),
          col("__ln_v"))), lit(0L)).as("n_agree"))
      .select(col(idField), col("label"),
        col("__ln_m.l").as("majority_label"),
        (-col("__ln_m.nv")).as("majority_votes"),
        col("n_agree"),
        (col("__ln_m.l") =!= col("label") &&
          -col("__ln_m.nv") > col("n_agree")).as("flagged"))
  }
}

/** Embedding dimension health — per-dimension count/mean/variance over
  * the corpus, from per-row floor-quantized values so every sum is an
  * order-independent BIGINT: dead dimensions (near-zero variance —
  * projector bugs, truncated exports) and scale anomalies show up as
  * rows in an O(dim) table instead of silently degrading every
  * downstream ANN/cosine operator. Variance is the exact rational
  * (n·Σq² − (Σq)²)/n², kept in exact q² (micro) units. */
object EmbeddingHealth {

  def dimStats(
      df: DataFrame,
      embField: String,
      scale: Long = 1000L,
      deadVarMicro: Long = 1000L
  ): DataFrame =
    df.select(posexplode(col(embField).cast(ArrayType(DoubleType)))
        .as(Seq("dim", "__eh_x")))
      .groupBy(col("dim").cast(LongType).as("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("__eh_x") * scale).cast(LongType)).as("sum_q"),
        sum(floor(col("__eh_x") * scale).cast(LongType)
          * floor(col("__eh_x") * scale).cast(LongType)).as("sum_q2"))
      .withColumn("mean_milli",
        floor(col("sum_q").cast("double") / col("n")).cast(LongType))
      .withColumn("var_micro",
        floor((col("n") * col("sum_q2") - col("sum_q") * col("sum_q"))
          .cast("double") / (col("n") * col("n"))).cast(LongType))
      .withColumn("is_dead", col("var_micro") < deadVarMicro)
}

/** PCA WHITENING for embedding columns — the standard pre-ANN /
  * pre-clustering conditioning step (decorrelate + unit-variance):
  * whitened cosine ≈ Mahalanobis similarity, IVF/LSH bucket balance
  * improves, and dominant nuisance directions (length, boilerplate)
  * stop swamping the metric.
  *
  * Scale shape, the part that matters at 100 TB: the covariance fit is
  * ONE `mapPartitions` fold — each partition accumulates a local
  * d-vector of sums plus a d×d product matrix in primitive double
  * arrays (upper triangle computed, mirrored once at combine), so the
  * job ships #partitions O(d²) blobs to the driver and nothing else:
  * no shuffle, no per-row d² structs (the earlier explode formulation
  * paid ~100× interpreted-struct overhead per multiply and was
  * intractable at d = 1024, where d² = 1M structs/row; a d = 1024
  * partial is 8 MB — 32 of them is driver-trivial). The d×d
  * eigensolve is DRIVER-side (cyclic Jacobi — d is 16-1024 in
  * practice, microseconds to milliseconds); the projection is a
  * row-local expression over literal arrays (zip_with dot products),
  * zero shuffle. Nothing corpus-sized ever concentrates anywhere.
  *
  * Determinism: double sums fold in partition order, so the fitted
  * model carries float noise in the last ulps — model-dependent
  * outputs are therefore gated through TOLERANCED invariants (the HLL
  * `est_ok` discipline), not exact replay: [[whitenCheck]] emits
  * per-dimension unit-variance and zero-covariance booleans with a
  * milli tolerance that dwarfs the noise. */
object PcaWhiten {

  final case class Model(
      means: Array[Double],
      eigvals: Array[Double],
      /** rows = eigenvectors (descending eigenvalue). */
      components: Array[Array[Double]])

  /** Covariance fit: one per-partition matrix fold + driver Jacobi. */
  def fit(df: DataFrame, embField: String): Model = {
    val (_, means, cov) = covFold(df, embField)
    val (vals, vecs) = jacobi(cov)
    val order = vals.indices.sortBy(k => -vals(k))
    Model(means,
      order.map(vals).toArray,
      order.map(k => vecs.map(_(k))).toArray)
  }

  /** Production covariance leg: `mapPartitions` folds (n, Σx, Σxxᵀ)
    * into primitive arrays — upper triangle only in the hot loop,
    * mirrored once after the driver combine. Ships #partitions O(d²)
    * blobs; zero shuffle; ~n·d²/2 fused multiply-adds with no
    * per-element interpretation. Null embedding rows are skipped
    * (matching the explode leg, where `explode(null)` drops the row).
    * Returns (n, means, covariance matrix). */
  private[graft] def covFold(df: DataFrame, embField: String)
      : (Double, Array[Double], Array[Array[Double]]) = {
    val ss = df.sparkSession
    import ss.implicits._
    val partials = df
      .select(col(embField).cast(ArrayType(DoubleType)))
      .as[Seq[Double]]
      .mapPartitions { it =>
        var n = 0L
        var d = -1
        var sums: Array[Double] = null
        var sp: Array[Double] = null // row-major d×d, upper triangle
        while (it.hasNext) {
          val row = it.next()
          if (row != null) {
            val x = row.toArray
            if (d < 0) {
              d = x.length
              sums = new Array[Double](d)
              sp = new Array[Double](d * d)
            }
            var i = 0
            while (i < d) {
              val xi = x(i)
              sums(i) += xi
              val base = i * d
              var j = i
              while (j < d) { sp(base + j) += xi * x(j); j += 1 }
              i += 1
            }
            n += 1
          }
        }
        if (n == 0L) Iterator.empty else Iterator.single((n, sums, sp))
      }
      .collect()
    require(partials.nonEmpty, s"PcaWhiten: no non-null '$embField' rows")
    val d = partials.head._2.length
    var n = 0.0
    val sums = new Array[Double](d)
    val sp = new Array[Double](d * d)
    partials.foreach { case (pn, psums, psp) =>
      n += pn.toDouble
      var k = 0
      while (k < d) { sums(k) += psums(k); k += 1 }
      k = 0
      while (k < d * d) { sp(k) += psp(k); k += 1 }
    }
    val means = sums.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      sp(a * d + b) / n - means(i) * means(j)
    }
    (n, means, cov)
  }

  /** The superseded explode formulation (per-row d² structs through a
    * (i,j)-keyed agg), kept ONLY as the independent oracle for the
    * fold≡explode parity spec — do not use in production paths: the
    * interpreted-struct overhead is ~100× and d = 1024 materializes 1M
    * structs per row. */
  private[graft] def covExplode(df: DataFrame, embField: String)
      : (Double, Array[Double], Array[Array[Double]]) = {
    val e = col(embField).cast(ArrayType(DoubleType))
    val pairs = df
      .select(explode(flatten(transform(e, (xi, i) =>
        transform(e, (xj, j) =>
          struct(i.as("i"), j.as("j"), (xi * xj).as("p"),
            xi.as("x")))))).as("s"))
      .select(col("s.i"), col("s.j"), col("s.p"), col("s.x"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("sp"), sum(col("x")).as("sx"),
        count(lit(1)).as("n"))
      .collect()
    val d = pairs.map(_.getInt(0)).max + 1
    val n = pairs.head.getLong(4).toDouble
    val sums = Array.ofDim[Double](d)
    val sprod = Array.ofDim[Double](d, d)
    pairs.foreach { r =>
      sprod(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      if (r.getInt(1) == 0) sums(r.getInt(0)) = r.getDouble(3)
    }
    val means = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      sprod(i)(j) / n - means(i) * means(j))
    (n, means, cov)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector MATRIX with vectors in COLUMNS). */
  private[graft] def jacobi(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign convention must map theta = 0 to +1 (equal diagonal
            // entries still need the full 45-degree rotation)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project + whiten: appends `dest` = diag(1/√(λ+eps)) · Vᵀ (x − μ).
    * Row-local literal-array arithmetic, zero shuffle. r13: one d×d
    * native kernel per row ([[graft.functions.PcaProjectExpr]] —
    * pre-scaled weight rows, same `x·sc` driver arithmetic) replaces
    * the d²-element interpreted HOF tree (a zip_with + aggregate per
    * output dimension); bit-identical, incl. the null/length contract
    * (parity-spec'd against [[projectHof]]). */
  def project(
      df: DataFrame,
      embField: String,
      model: Model,
      dest: String = "whitened",
      eps: Double = 1e-9
  ): DataFrame = {
    val weights = model.components.zip(model.eigvals).map {
      case (row, lam) =>
        val sc = 1.0 / math.sqrt(math.max(lam, 0.0) + eps)
        row.map(x => x * sc)
    }
    val e = col(embField).cast(ArrayType(DoubleType))
    df.withColumn(dest,
      graft.functions.functions.pca_project(
        e, weights.toIndexedSeq.map(_.toIndexedSeq), model.means))
  }

  /** The pre-r13 HOF formulation of [[project]] — parity-spec
    * reference only. */
  private[graft] def projectHof(
      df: DataFrame,
      embField: String,
      model: Model,
      dest: String = "whitened",
      eps: Double = 1e-9
  ): DataFrame = {
    val mLit = array(model.means.map(lit): _*)
    val wRows = model.components.zip(model.eigvals).map {
      case (row, lam) =>
        val sc = 1.0 / math.sqrt(math.max(lam, 0.0) + eps)
        array(row.map(x => lit(x * sc)): _*)
    }
    val wLit = array(wRows: _*)
    val e = col(embField).cast(ArrayType(DoubleType))
    val centered = zip_with(e, mLit, (x, m) => x - m)
    // bind `centered` once via the single-element-array trick
    val out = flatten(transform(array(centered), cArr =>
      transform(wLit, row =>
        aggregate(zip_with(row, cArr, (w, x) => w * x),
          lit(0.0), (acc, x) => acc + x))))
    df.withColumn(dest, out)
  }

  /** Release check: per output dimension, |variance − 1| and the max
    * |covariance| against every LOWER dimension, both milli-floored and
    * gated with `tolMilli` — the toleranced-invariant oracle surface
    * (float noise lives orders of magnitude below the gate). */
  def whitenCheck(
      whitened: DataFrame,
      field: String = "whitened",
      tolMilli: Long = 100L
  ): DataFrame = {
    // Same per-partition matrix fold as the fit (the check is just a
    // second covariance pass over the OUTPUT column); the result table
    // is d rows — design-table-sized — built locally.
    val (_, _, cov) = covFold(whitened, field)
    val d = cov.length
    val rows = (0 until d).map { i =>
      val varErrMilli =
        math.floor(math.abs(cov(i)(i) - 1.0) * 1000.0).toLong
      val maxCovMilli =
        if (i == 0) 0L
        else math.floor(
          (0 until i).map(j => math.abs(cov(i)(j))).max * 1000.0).toLong
      (i.toLong, varErrMilli <= tolMilli, maxCovMilli <= tolMilli)
    }
    val ss = whitened.sparkSession
    import ss.implicits._
    rows.toDF("dim", "var_ok", "cov_ok")
  }
}

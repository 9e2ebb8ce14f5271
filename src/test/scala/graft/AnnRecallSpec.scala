package graft

import graft.operators.{BbitMinHash, CosineKnn}
import org.apache.spark.sql.functions._

/** ANN quality: recall of the bucketed paths against the exact baseline
  * on the real embeddings table — the measurement that justifies the
  * scale path (SCALE.md §3). */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def recallAt(k: Int, approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("LSH ANN recall@10 beats random and self is always found") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = topkMap(CosineKnn.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val lsh = topkMap(CosineKnn.annTopK(emb, queries, "embedding", "vec_id", 10, nPlanes = 4))
    val r = recallAt(10, lsh, exact)
    // 4 planes ≈ 16 buckets over 50 vectors: recall is partial by design
    // but must be far better than the ~1/16 a random bucket would give
    assert(r > 0.25, s"LSH recall@10 = $r")
    // self-match always survives bucketing (identical vector, same bucket)
    lsh.foreach { case (q, got) => assert(got.contains(q)) }
  }

  test("k-means centroids separate two blobs; trained IVF finds neighbors") {
    import org.apache.spark.sql.functions._
    // two clean blobs along +x and +y
    val blobs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Seq(10.0f, 0.0f) else Seq(0.0f, 10.0f)
      (i, base.map(_ + (i % 7).toFloat / 10f))
    }.toDF("vec_id", "embedding")
    val cents = graft.operators.CosineKnn
      .kmeansCentroids(blobs, "embedding", "vec_id", k = 2, iters = 2)
      .select("ce").as[Seq[Double]].collect()
    assert(cents.length == 2)
    // one centroid per blob direction
    val dirs = cents.map(c => if (c(0) > c(1)) "x" else "y").toSet
    assert(dirs == Set("x", "y"))
    val out = graft.operators.CosineKnn.ivfTopK(blobs,
      blobs.filter(col("vec_id") === 0), "embedding", "vec_id",
      k = 5, nCentroids = 2, trainIters = 2)
    val ids = out.select("corpus_id").as[Long].collect().toSet
    assert(ids.contains(0L) && ids.forall(_ % 2 == 0)) // same-blob only
  }

  test("IVF ANN recall@10 beats random; self always found") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = topkMap(CosineKnn.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val ivf = topkMap(CosineKnn.ivfTopK(emb, queries, "embedding", "vec_id", 10, nCentroids = 4))
    val r = recallAt(10, ivf, exact)
    assert(r > 0.25, s"IVF recall@10 = $r")
    ivf.foreach { case (q, got) => assert(got.contains(q)) }
  }

  test("PQ: codes compress, exact copy ranks first, recall beats random") {
    import graft.operators.ProductQuantizer
    val rows = emb.orderBy("vec_id").limit(16)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val cbs = ProductQuantizer.codebooksFrom(rows, m = 8)
    assert(cbs.length == 8 && cbs.head.length == 16 && cbs.head.head.length == 8)
    val enc = ProductQuantizer.encode(emb, "embedding", cbs)
    // M codes per vector, all within the codebook range
    val codes = enc.select("pq_code").as[Seq[Long]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
    // a codebook row encodes to ITSELF in every subspace (d = 0 argmin)
    val self = enc.filter(col("vec_id") === 3L)
      .select("pq_code").as[Seq[Long]].head()
    assert(self == Seq.fill(8)(3L))
    // exact-copy query: the copy's codes are identical, so ADC distance
    // is the minimum possible and the copy is in the top ranks
    val queries = emb.filter(col("vec_id") < 8)
    val top = ProductQuantizer.adcTopK(enc, queries, "embedding", "vec_id",
      k = 10, cbs)
    val got = topkMap(top)
    got.foreach { case (q, ids) => assert(ids.contains(q), s"query $q lost itself") }
    // ADC recall@10 against exact brute force beats random guessing
    val exact = topkMap(CosineKnn.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val r = recallAt(10, got, exact)
    assert(r > 0.25, s"PQ ADC recall@10 = $r")
    // ranks are 1..k, distances non-decreasing within a query
    val byRank = top.select("query_id", "rank", "adist")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    byRank.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
  }

  test("BitextMine: true pair out-margins the hub; threshold prunes") {
    import graft.operators.BitextMine
    // y-side: three axis directions + a diagonal
    val ys = Seq(
      (101L, Seq(1.0f, 0f, 0f, 0f)), (102L, Seq(0f, 1.0f, 0f, 0f)),
      (103L, Seq(0f, 0f, 1.0f, 0f)), (104L, Seq(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    // x1 ≈ y1 (a true translation pair); x2 sits equidistant from
    // everything (a hub) — cosine alone can't separate them, margin can
    val xs = Seq(
      (1L, Seq(0.99f, 0.01f, 0f, 0f)),
      (2L, Seq(0f, 0.7071f, 0.7071f, 0f))
    ).toDF("vec_id", "embedding")
    val mined = BitextMine.marginPairs(xs, ys, "embedding", "vec_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(mined.map(_._1) == Seq(1L, 2L))
    val m1 = mined.find(_._1 == 1L).get
    val m2 = mined.find(_._1 == 2L).get
    assert(m1._2 == 101L, s"x1 should pair with y1: $mined")
    assert(m1._3 > m2._3, s"true pair must out-margin the hub: $mined")
    assert(m1._3 > 10000L, s"true pair margin above 1.0: $mined")
    // thresholding keeps only the confident pair
    val strict = BitextMine.marginPairs(xs, ys, "embedding", "vec_id",
      k = 2, minMarginScaled = Some(m2._3 + 1))
      .collect().map(_.getLong(0)).toSeq
    assert(strict == Seq(1L))
  }

  test("BbitMinHash: pack layout, agreements, debiased estimate") {
    val b = 4; val k = 8
    // identical signatures agree everywhere -> est = 1e6 exactly
    val sigA = Seq(0x10L, 0x21L, 0x32L, 0x43L, 0x54L, 0x65L, 0x76L, 0x87L)
    // differs from sigA in the low nibble at positions 1 and 6 only
    val sigB = Seq(0x10L, 0x2fL, 0x32L, 0x43L, 0x54L, 0x65L, 0x7eL, 0x87L)
    val df = Seq((sigA, sigB)).toDF("a", "b")
      .withColumn("pa", BbitMinHash.pack(col("a"), b))
      .withColumn("pb", BbitMinHash.pack(col("b"), b))
    val row = df.select(
      $"pa", $"pb",
      BbitMinHash.agreements($"pa", $"pa", b, k).as("self"),
      BbitMinHash.agreements($"pa", $"pb", b, k).as("cross"),
      BbitMinHash.estJaccardPpm(
        BbitMinHash.agreements($"pa", $"pa", b, k), b, k).as("estSelf"),
      BbitMinHash.estJaccardPpm(
        BbitMinHash.agreements($"pa", $"pb", b, k), b, k).as("estCross")
    ).collect().head
    // Horner layout: nibble j at bits [4j, 4j+4); k=8 fits one word
    val expected = sigA.zipWithIndex.map { case (v, j) => (v & 15L) << (4 * j) }.sum
    assert(row.getSeq[Long](0) == Seq(expected))
    assert(row.getLong(2) == 8L && row.getLong(4) == 1000000L)
    assert(row.getLong(3) == 6L)
    // (6/8 - 1/16) / (1 - 1/16) = (16*6 - 8) / (8*15) in ppm, floored
    assert(row.getLong(5) == 1000000L * (16 * 6 - 8) / (8 * 15))
    // estimate clamps at 0 when agreement is at/below the collision floor
    val low = Seq((Seq.fill(8)(0L), Seq.fill(8)(1L))).toDF("a", "b")
      .select(BbitMinHash.estJaccardPpm(
        BbitMinHash.agreements(
          BbitMinHash.pack(col("a"), b), BbitMinHash.pack(col("b"), b), b, k),
        b, k).as("e")).collect().head.getLong(0)
    assert(low == 0L)
  }

  test("BbitMinHash: multi-word packing past 63/b values round-trips") {
    val b = 8; val k = 20 // perWord = 7 -> 3 words
    val sig = (0 until k).map(i => (i * 37 + 5).toLong % 256)
    val df = Seq(Tuple1(sig)).toDF("s")
      .withColumn("p", BbitMinHash.pack(col("s"), b))
    val packed = df.select($"p").collect().head.getSeq[Long](0)
    assert(packed.length == 3)
    // unpack by hand and compare
    val unpacked = (0 until k).map { pos =>
      val w = pos / 7; val off = pos % 7
      (packed(w) >> (8 * off)) & 255L
    }
    assert(unpacked == sig.map(_ & 255L))
    // self-agreement is k on the multi-word path too
    val self = df.select(
      BbitMinHash.agreements($"p", $"p", b, k).as("a")).collect().head.getLong(0)
    assert(self == k.toLong)
  }

  test("IVFADC: cluster-pruned ADC finds self and tracks full-scan ADC") {
    import graft.operators.ProductQuantizer
    val cents = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(col("vec_id").cast("int"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
    val rows = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val cbs = ProductQuantizer.codebooksFrom(rows, m = 8)
    val enc = ProductQuantizer.assignClusters(
      ProductQuantizer.encode(emb, "embedding", cbs), "embedding", cents)
    val queries = emb.filter(col("vec_id") < 10)
    val ivf = topkMap(ProductQuantizer.ivfAdcTopK(
      enc, queries, "embedding", "vec_id", 10, cbs, cents, nProbe = 3))
    val full = topkMap(ProductQuantizer.adcTopK(
      enc, queries, "embedding", "vec_id", 10, cbs))
    // pruning can only lose candidates outside the probed clusters;
    // with 3 of 8 clusters probed recall must stay well above chance
    val r = recallAt(10, ivf, full)
    assert(r > 0.4, s"IVFADC recall@10 vs full ADC = $r")
    // the query's own (zero-ADC-distance) code is in its own cluster,
    // which is always the first probe -> self always found
    ivf.foreach { case (q, got) => assert(got.contains(q), s"$q lost itself") }
    // every IVFADC hit must also score identically in the full scan
    val ivfD = ProductQuantizer.ivfAdcTopK(
      enc, queries, "embedding", "vec_id", 10, cbs, cents, nProbe = 3)
      .select($"query_id", $"corpus_id", $"adist").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val fullD = ProductQuantizer.adcTopK(
      enc, queries, "embedding", "vec_id", 50, cbs)
      .select($"query_id", $"corpus_id", $"adist").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    ivfD.foreach { case (key, d) =>
      fullD.get(key).foreach(fd => assert(fd == d, s"distance mismatch at $key"))
    }
  }
}

class CentroidMapSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.CentroidMap
  import org.apache.spark.sql.functions._

  test("sum-vector cosine equals mean-vector cosine; quantization exact") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.02f)),   // group 0 ~ x-axis
      (1, Seq(0.0f, 1.0f)), (1, Seq(0.02f, 1.0f)),   // group 1 ~ y-axis
      (2, Seq(1.0f, 0.01f))                          // group 2 ~ x-axis
    ).toDF("label", "embedding")
    val got = CentroidMap.pairwise(df, "label", "embedding")
      .orderBy("grp_a", "grp_b")
      .select("grp_a", "grp_b", "n_a", "n_b", "cos_ppm")
      .as[(Int, Int, Long, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((0, 1, 2L, 2L), (0, 2, 2L, 1L), (1, 2, 2L, 1L)))
    val cos = got.map(t => ((t._1, t._2), t._5)).toMap
    assert(cos((0, 2)) > 990000L)            // both x-ish: near 1
    assert(cos((0, 1)) < 30000L)             // orthogonal-ish: near 0
    assert(cos((1, 2)) < 30000L)
  }

  test("repartition-stable: per-row quantization makes sums exact") {
    val data = (1 to 50).map(i => (i % 4, Seq(i * 0.013f, 1.0f - i * 0.007f)))
    val a = CentroidMap.pairwise(data.toDF("label", "embedding"),
      "label", "embedding").orderBy("grp_a", "grp_b")
    val b = CentroidMap.pairwise(data.toDF("label", "embedding").repartition(13),
      "label", "embedding").orderBy("grp_a", "grp_b")
    assert(rows(a) == rows(b))
  }
}

class MedoidSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Medoid
  import org.apache.spark.sql.functions._

  test("medoid is the member closest to its cluster-mates; singletons kept") {
    val df = Seq(
      // cluster 0: 10/11 point x-ish, 12 is the outlier; 11 sits between
      (10L, 0, Seq(1.0f, 0.0f)),
      (11L, 0, Seq(0.9f, 0.3f)),
      (12L, 0, Seq(0.0f, 1.0f)),
      // cluster 1: singleton
      (20L, 1, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "label", "embedding")
    val got = Medoid.perCluster(df, "vec_id", "embedding", "label")
      .orderBy("cluster")
      .select("cluster", "medoid_id", "n_members")
      .as[(Long, Long, Long)].collect().toSeq
    // 11 has high cos to BOTH 10 (0.948) and 12 (0.316); 10's sum is
    // 0.948 + 0, 12's is 0.316 + 0 -> 11 wins
    assert(got == Seq((0L, 11L, 3L), (1L, 20L, 1L)))
  }

  test("cap bounds the pairwise work deterministically") {
    val df = (1 to 30).map(i => (i.toLong, 0, Seq(1.0f, i * 0.01f)))
      .toDF("vec_id", "label", "embedding")
    val a = Medoid.perCluster(df, "vec_id", "embedding", "label", cap = 10)
    val b = Medoid.perCluster(df.repartition(7), "vec_id", "embedding", "label", cap = 10)
    assert(rows(a) == rows(b))
    assert(a.select("n_members").as[Long].head() == 10L)
  }

  test("portable cap: same schema, caps to the same size, and is a " +
    "no-op (≡ uncapped, ≡ xxhash leg) when no cluster exceeds the cap") {
    val df = (1 to 30).map(i =>
      (i.toLong, i % 3, Seq(1.0f, i * 0.01f, (i % 7) * 0.1f)))
      .toDF("vec_id", "label", "embedding")
    // clusters of 10 each; cap=10 binds exactly, cap=1000 not at all
    val un = Medoid.perCluster(df, "vec_id", "embedding", "label")
    val x10 = Medoid.perCluster(df, "vec_id", "embedding", "label", cap = 10)
    val p10 = Medoid.perCluster(df, "vec_id", "embedding", "label",
      cap = 10, portable = true)
    assert(rows(un) == rows(x10) && rows(un) == rows(p10))
    // cap below cluster size: both legs cap to the same COUNT (the
    // sampled membership differs by hash — that's the point of the
    // portable twin existing), and schemas agree
    val x2 = Medoid.perCluster(df, "vec_id", "embedding", "label", cap = 2)
    val p2 = Medoid.perCluster(df, "vec_id", "embedding", "label",
      cap = 2, portable = true)
    assert(x2.schema == p2.schema)
    assert(x2.select("n_members").as[Long].collect().forall(_ == 2L))
    assert(p2.select("n_members").as[Long].collect().forall(_ == 2L))
    // portable leg is partitioning-invariant like the xxhash one
    assert(rows(p2) == rows(Medoid.perCluster(df.repartition(7),
      "vec_id", "embedding", "label", cap = 2, portable = true)))
  }
}

class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.LabelNoise
  import org.apache.spark.sql.functions._

  test("a mislabeled vector inside a tight cluster gets flagged") {
    val df = Seq(
      (1L, Seq(1.0f, 0.00f), 0L),
      (2L, Seq(1.0f, 0.01f), 0L),
      (3L, Seq(1.0f, 0.02f), 9L), // mislabeled: sits among label-0 vecs
      (4L, Seq(0.0f, 1.00f), 1L),
      (5L, Seq(0.01f, 1.0f), 1L),
      (6L, Seq(0.02f, 1.0f), 1L)
    ).toDF("vec_id", "embedding", "label")
    val got = LabelNoise.knnDisagreement(df, "vec_id", "embedding", "label", k = 2)
      .orderBy("vec_id")
      .select("vec_id", "label", "majority_label", "n_agree", "flagged")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(3L)._3 == 0L && byId(3L)._4 == 0L && byId(3L)._5)
    assert(!byId(1L)._5 && !byId(4L)._5 && !byId(5L)._5)
  }
}

class HistogramDriftSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.HistogramDrift
  import org.apache.spark.sql.functions._

  test("identical slices -> 0; disjoint -> 1e6; partial shift exact") {
    def tv(rows: Seq[(String, Long)]): (Long, Long, Long) =
      HistogramDrift.totalVariation(rows.toDF("slice", "bucket"),
          "slice", "bucket", "a", "b")
        .select("tv_ppm", "top_bucket", "n_buckets")
        .as[(Long, Long, Long)].head()
    // identical
    assert(tv(Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)))._1 == 0L)
    // disjoint buckets
    val dis = tv(Seq(("a", 1L), ("a", 1L), ("b", 2L)))
    assert(dis._1 == 1000000L)
    // a: {1:2, 2:2}; b: {1:1, 2:3} -> TV = 0.5*(|.5-.25| + |.5-.75|) = 0.25
    val part = tv(Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 2L), ("b", 2L)))
    assert(part._1 == 250000L && part._3 == 2L)
  }
}

class EmbeddingHealthSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.EmbeddingHealth
  import org.apache.spark.sql.functions._

  test("dead dims flagged; mean/var exact from quantized sums") {
    val df = Seq(
      Seq(1.0f, 0.5f, 0.001f),
      Seq(-1.0f, 0.5f, 0.001f),
      Seq(1.0f, 0.5f, 0.001f)
    ).toDF("embedding")
    val got = EmbeddingHealth.dimStats(df, "embedding")
      .orderBy("dim")
      .select("dim", "n", "mean_milli", "var_micro", "is_dead")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // dim0: q = [1000,-1000,1000] mean=333.33->333 var=(3*3e6-1e6)/9*1000
    assert(got(0)._3 == 333L && !got(0)._5)
    assert(got(0)._4 == (3L * 3000000L - 1000000L) / 9L)
    // dim1: constant 0.5 -> q=500, var=0 -> dead
    assert(got(1)._4 == 0L && got(1)._5)
    // dim2: 0.001f quantizes to q=1 -> constant -> dead
    assert(got(2)._5)
  }
}

class PcaWhitenSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.PcaWhiten
  import org.apache.spark.sql.functions._

  test("jacobi: known symmetric 2x2 eigensystem") {
    val (vals, vecs) = PcaWhiten.jacobi(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
    // eigenvector for lambda=3 is (1,1)/sqrt(2): |x| == |y|
    val k = vals.indexWhere(v => math.abs(v - 3.0) < 1e-9)
    assert(math.abs(math.abs(vecs(0)(k)) - math.abs(vecs(1)(k))) < 1e-9)
  }

  test("whitening a correlated cloud yields unit variance and zero " +
    "covariance in every output dimension") {
    // y strongly correlated with x; z an independent small-variance dim
    val rows = (0 until 400).map { i =>
      val x = (i % 20).toDouble - 9.5
      val y = 2.0 * x + ((i * 7) % 5).toDouble - 2.0
      val z = ((i * 13) % 3).toDouble * 0.1
      Tuple1(Seq(x, y, z))
    }
    val df = rows.toDF("embedding")
    val model = PcaWhiten.fit(df, "embedding")
    assert(model.eigvals.length == 3 &&
      model.eigvals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    val white = PcaWhiten.project(df, "embedding", model)
    val checks = PcaWhiten.whitenCheck(white, "whitened", tolMilli = 10L)
      .select("dim", "var_ok", "cov_ok")
      .as[(Long, Boolean, Boolean)].collect()
    assert(checks.length == 3)
    assert(checks.forall(c => c._2 && c._3), checks.mkString(", "))
    // model is partition-layout tolerant: refit on a repartition stays
    // inside the same tolerance gates
    val model2 = PcaWhiten.fit(df.repartition(7), "embedding")
    val white2 = PcaWhiten.project(df, "embedding", model2)
    assert(PcaWhiten.whitenCheck(white2, "whitened", tolMilli = 10L)
      .filter(!col("var_ok") || !col("cov_ok")).count() == 0L)
  }

  test("constant dimension: eps floor keeps the projection finite") {
    val df = (0 until 50).map(i =>
      Tuple1(Seq((i % 10).toDouble, 4.2))).toDF("embedding")
    val model = PcaWhiten.fit(df, "embedding")
    val out = PcaWhiten.project(df, "embedding", model)
      .select(col("whitened"))
      .as[Seq[Double]].collect()
    assert(out.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }

  test("parity: per-partition matrix fold == explode-formulation " +
    "covariance (means, cov, n) to float tolerance") {
    val rows = (0 until 300).map { i =>
      Tuple1(Seq.tabulate(8)(k =>
        math.sin(i * 0.37 + k) * (k + 1) + (i % 11) * 0.2))
    }
    val df = rows.toDF("embedding").repartition(5)
    val (nF, meansF, covF) = PcaWhiten.covFold(df, "embedding")
    val (nE, meansE, covE) = PcaWhiten.covExplode(df, "embedding")
    assert(nF == nE)
    meansF.zip(meansE).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"mean $a vs $b") }
    for (i <- covF.indices; j <- covF.indices)
      assert(math.abs(covF(i)(j) - covE(i)(j)) < 1e-9,
        s"cov($i)($j): ${covF(i)(j)} vs ${covE(i)(j)}")
    // symmetry of the mirrored triangle
    for (i <- covF.indices; j <- covF.indices)
      assert(covF(i)(j) == covF(j)(i))
  }

  test("fold skips null embedding rows like explode(null) drops them") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(Seq(1.0, 2.0)),
        org.apache.spark.sql.Row(null),
        org.apache.spark.sql.Row(Seq(3.0, 4.0)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true))))
    val (n, means, _) = PcaWhiten.covFold(df, "embedding")
    assert(n == 2.0)
    assert(math.abs(means(0) - 2.0) < 1e-12 &&
      math.abs(means(1) - 3.0) < 1e-12)
  }
}

package graft

import graft.operators.{BloomSketch, DistinctSketch, Profile, QuantileClip}
import org.apache.spark.sql.functions._

/** One-pass profiling and percentile-clip filter semantics. */
class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L),
    (4L, Some("a"), 40L), (5L, Some("c"), 1000L)
  ).toDF("id", "tag", "len")

  test("summarize: counts, nulls, distinct, stringified min/max per column") {
    val p = Profile.summarize(df, Seq("id", "tag", "len"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("tag") == ((5L, 1L, 3L, "a", "c")))   // null not counted as distinct
    assert(p("len") == ((5L, 0L, 5L, "10", "1000")))
  }

  test("summarize: approx-distinct leg has no Expand in the plan") {
    val exact = Profile.summarize(df, Seq("id", "tag"), exactDistinct = true)
    val approx = Profile.summarize(df, Seq("id", "tag"), exactDistinct = false)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    // and on this tiny/low-cardinality data HLL++ is exact
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == Map("id" -> 5L, "tag" -> 3L))
  }

  test("keepWithin drops distribution tails, keeps interior inclusively") {
    val wide = (1L to 100L).toDF("v")
    val kept = QuantileClip.keepWithin(wide, "v", 0.10, 0.90)
      .as[Long].collect().sorted
    // p10 of 1..100 = 1 + 0.10*99 = 10.9; p90 = 90.1 → keep 11..90
    assert(kept.head == 11L && kept.last == 90L && kept.length == 80)
  }

  test("histogram bins by floor(v/width)*width, skips nulls") {
    val d = Seq(Some(0L), Some(49L), Some(50L), Some(149L), None)
      .toDF("v")
    val h = Profile.histogram(d, "v", 50L)
      .as[(Long, Long)].collect().toMap
    assert(h == Map(0L -> 2L, 50L -> 1L, 100L -> 1L))
  }

  test("keepWithin approx leg agrees with exact on bounded cardinality") {
    val wide = (1L to 100L).map(i => i % 10).toDF("v")
    val e = QuantileClip.keepWithin(wide, "v", 0.05, 0.95, exact = true).count()
    val a = QuantileClip.keepWithin(wide, "v", 0.05, 0.95, exact = false).count()
    assert(e == a)
  }

  test("DistinctSketch: shard sketches merge to the whole-data estimate") {
    // 10k values, 2.5k distinct per group; overlap across shards
    val data = (1L to 10000L).map(i => (if (i % 2 == 0) "a" else "b", s"v${i % 5000}"))
      .toDF("g", "v")
    val whole = DistinctSketch.mergedEstimate(
      DistinctSketch.build(data, Seq("g"), "v"), Seq("g"))
    val shards = Seq(0L, 1L, 2L).map(r =>
      DistinctSketch.build(
        data.withColumn("r", monotonically_increasing_id() % 3)
          .filter(col("r") === r).drop("r"),
        Seq("g"), "v"))
    val merged = DistinctSketch.mergedEstimate(
      shards.reduce(_ unionByName _), Seq("g"))
    val w = whole.as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val m = merged.as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // merging per-shard sketches is lossless vs sketching the whole
    assert(w == m)
    // and the estimate is within 5% of the exact distinct count
    val exact = data.groupBy("g").agg(countDistinct("v")).as[(String, Long)]
      .collect().toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(w(g) - d).toDouble / d < 0.05, s"group $g: est=${w(g)} exact=$d")
    }
    // n_rows carries through the merge
    assert(merged.as[(String, Long, Long)].collect().map(_._2).sum == 10000L)
  }

  test("QuantileSketch: null values are excluded, not fatal") {
    import graft.operators.QuantileSketch
    val d = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v").withColumn("g", lit("g"))
    val q = QuantileSketch.quantiles(
      QuantileSketch.build(d, "g", "v"), "g", Seq(0.5)).collect().head
    assert(q.getAs[Long]("n_rows") == 2L)
    assert(q.getAs[Double]("q_50") >= 1.0 && q.getAs[Double]("q_50") <= 3.0)
  }

  test("QuantileSketch: shard-merged medians within KLL rank error") {
    import graft.operators.QuantileSketch
    val n = 20000
    val data = (0 until n).map(i => ("g", ((i * 2654435761L) % n).toDouble))
      .toDF("g", "v")
    val shards = Seq(0, 1, 2).map(r =>
      QuantileSketch.build(
        data.withColumn("r", monotonically_increasing_id() % 3)
          .filter(col("r") === r).drop("r"),
        "g", "v"))
    val merged = QuantileSketch.merge(shards.reduce(_ unionByName _), "g")
    val qs = QuantileSketch.quantiles(merged, "g", Seq(0.1, 0.5, 0.9))
      .collect().head
    assert(qs.getAs[Long]("n_rows") == n.toLong)
    val (q10, q50, q90) = (qs.getAs[Double]("q_10"),
      qs.getAs[Double]("q_50"), qs.getAs[Double]("q_90"))
    assert(q10 <= q50 && q50 <= q90)
    // values are a permutation of 0..n-1: normalized rank == value/n;
    // KLL k=200 guarantees ~1.65% rank error, assert a loose 3%
    assert(math.abs(q50 / n - 0.5) < 0.03, s"median rank off: $q50")
    assert(math.abs(q10 / n - 0.1) < 0.03, s"p10 rank off: $q10")
    assert(math.abs(q90 / n - 0.9) < 0.03, s"p90 rank off: $q90")
  }

  test("FrequentSketch: no-false-negative heavy hitters survive shard merge") {
    import graft.operators.FrequentSketch
    // skewed stream: "hot" 5000x, "warm" 500x, tail of 2000 singletons —
    // beyond maxMapSize=64, so the sketch must actually evict
    val data = (
      Seq.fill(5000)("hot") ++ Seq.fill(500)("warm") ++
        (0 until 2000).map(i => s"t$i")
    ).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
      .withColumn("g", lit("g"))
    val shards = Seq(0L, 1L, 2L).map(r =>
      FrequentSketch.build(data.filter(col("i") % 3 === r), "g", "v",
        maxMapSize = 64))
    val merged = FrequentSketch.merge(shards.reduce(_ unionByName _), "g",
      maxMapSize = 64)
    assert(merged.select("n_rows").as[Long].head() == 7500L)
    val top = FrequentSketch.topK(merged, "g", 2)
      .orderBy("rank").select("item", "est")
      .as[(String, Long)].collect().toSeq
    // the guarantee: true heavy hitters are never lost, ranked first,
    // estimates within n/maxMapSize of truth
    assert(top.map(_._1) == Seq("hot", "warm"), top.toString)
    assert(math.abs(top.head._2 - 5000L) <= 7500L / 64, top.toString)
    assert(math.abs(top(1)._2 - 500L) <= 7500L / 64, top.toString)
  }

  test("FrequentSketch: non-power-of-2 maxMapSize fails fast on the driver") {
    import graft.operators.FrequentSketch
    val df = Seq(("g", "v")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      FrequentSketch.build(df, "g", "v", maxMapSize = 100)
    }
    intercept[IllegalArgumentException] {
      FrequentSketch.merge(df.withColumn("fi", lit(Array.empty[Byte]))
        .withColumn("n_rows", lit(0L)), "g", maxMapSize = 4)
    }
  }

  test("OverlapSketch: n_rows counts sketched (non-null) values only") {
    import graft.operators.OverlapSketch
    val df = Seq(("g", "a"), ("g", null), ("g", "b"), ("g", null))
      .toDF("g", "v")
    assert(OverlapSketch.build(df, "g", "v")
      .select("n_rows").as[Long].head() == 2L)
  }

  test("OverlapSketch: intersection estimate tracks the true overlap") {
    import graft.operators.OverlapSketch
    // A = 0..5999, B = 4000..9999 → |A∩B| = 2000, |A∪B| = 10000
    val a = (0 until 6000).map(i => ("g", s"v$i")).toDF("g", "v")
    val b = (4000 until 10000).map(i => ("g", s"v$i")).toDF("g", "v")
    val ov = OverlapSketch.overlap(
      OverlapSketch.build(a, "g", "v"),
      OverlapSketch.build(b, "g", "v"), "g").collect().head
    def near(est: Long, truth: Long, tol: Double) =
      math.abs(est - truth).toDouble / truth < tol
    assert(near(ov.getAs[Long]("est_a"), 6000L, 0.05), ov.toString)
    assert(near(ov.getAs[Long]("est_b"), 6000L, 0.05), ov.toString)
    assert(near(ov.getAs[Long]("est_union"), 10000L, 0.05), ov.toString)
    assert(near(ov.getAs[Long]("est_intersect"), 2000L, 0.10), ov.toString)
    // disjoint groups are dropped by the inner join
    val c = Seq(("h", "x")).toDF("g", "v")
    assert(OverlapSketch.overlap(
      OverlapSketch.build(a, "g", "v"),
      OverlapSketch.build(c, "g", "v"), "g").count() == 0)
  }

  test("SourceSimilarity.matrix: identical sources ~1, disjoint ~0, bounds") {
    import graft.operators.SourceSimilarity
    val words = (i: Int) => (0 until 12).map(j => s"w${i}_$j")
    // a and b share every doc; c is disjoint vocabulary
    val docs = (
      (0 until 5).map(i => ("a", words(i))) ++
        (0 until 5).map(i => ("b", words(i))) ++
        (0 until 5).map(i => ("c", (0 until 12).map(j => s"z${i}_$j")))
    ).toDF("source", "words")
    val m = SourceSimilarity.matrix(docs, "source", "words", numHashes = 16)
      .orderBy("src_a", "src_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(m.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c"))) // each unordered pair once
    val byPair = m.map(t => (t._1, t._2) -> t._4).toMap
    assert(byPair(("a", "b")) == 1.0) // identical shingle sets: every min agrees
    assert(byPair(("a", "c")) < 0.5)  // disjoint sets: agreement only by collision
    m.foreach { case (_, _, agree, est) =>
      assert(agree >= 0L && agree <= 16L && est == agree / 16.0)
    }
    // multiset invariance: duplicating docs changes no signature
    val doubled = docs.union(docs.limit(5))
    val m2 = SourceSimilarity.matrix(doubled, "source", "words", numHashes = 16)
      .orderBy("src_a", "src_b").collect().map(r => r.getLong(2)).toSeq
    assert(m2 == m.map(_._3).toSeq)
  }

  test("BloomSketch: no false negatives, lossless OR-merge, absent mostly out") {
    val m = 1008; val k = 3
    val vals = (0 until 200).map(i => (i.toLong, s"grp${i % 2}", s"value-$i"))
    val d = vals.toDF("id", "grp", "v")
    val full = BloomSketch.build(d, Seq("grp"), "v", m, k)
    // shard on id parity (coprime to the 2 groups' id % 2? ids alternate
    // groups, so shard on id / 2 % 2 to split both groups)
    val sh = BloomSketch.build(d.filter(($"id" / 2).cast("long") % 2 === 0), Seq("grp"), "v", m, k)
      .unionByName(BloomSketch.build(d.filter(($"id" / 2).cast("long") % 2 === 1), Seq("grp"), "v", m, k))
    val merged = BloomSketch.merge(sh, Seq("grp"), m)
    val cmp = full.as("f").join(merged.as("g"), "grp")
      .select(($"f.bloom" === $"g.bloom").as("ok"), $"g.n_rows")
      .collect()
    assert(cmp.forall(_.getBoolean(0)), "merge must equal the one-shot build")
    assert(cmp.map(_.getLong(1)).sorted.toSeq == Seq(100L, 100L))
    // every member probes positive in its own group's filter
    val probed = d.join(full, "grp")
      .select(BloomSketch.mightContain($"bloom", $"v", k, m).as("c"))
      .collect()
    assert(probed.forall(_.getBoolean(0)), "Bloom filters never false-negative")
    // absent values: fpr at n=100, m=1008, k=3 is ~2%; 50 probes stay low
    val fp = full.select($"bloom")
      .withColumn("p", explode(transform(sequence(lit(0), lit(49)),
        j => concat(lit("missing-"), j.cast("string")))))
      .select(BloomSketch.mightContain($"bloom", $"p", k, m).as("c"))
      .collect().count(_.getBoolean(0))
    assert(fp <= 10, s"false-positive count implausibly high: $fp/100")
    // nulls are excluded like the rest of the sketch family
    val withNull = d.union(Seq((999L, "grp0", null.asInstanceOf[String])).toDF("id", "grp", "v"))
    val n = BloomSketch.build(withNull, Seq("grp"), "v", m, k)
      .filter($"grp" === "grp0").select($"n_rows").collect().head.getLong(0)
    assert(n == 100L)
  }
}

class CountMinSketchSpec extends SparkSpec {
  import graft.operators.CountMinSketch
  import spark.implicits._

  private val W = 32
  private val D = 4

  private def multiset(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => s"w${rnd.nextInt(40)}")
  }

  test("point estimates overestimate, never underestimate") {
    val vals = multiset(600, 3)
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val sk = CountMinSketch.build(df, Seq("g"), "v", W, D)
    val est = sk.select(
      explode(
        transform(typedLit(truth.keys.toSeq.sorted),
          v => struct(v.as("v"),
            CountMinSketch.estimate(col("cm"), v, W, D).as("e"))))
        .as("x"))
      .select("x.v", "x.e").as[(String, Long)].collect().toMap
    truth.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v: est ${est(v)} < true $c")
      assert(est(v) <= c + 600, s"$v: bound blown")
    }
    assert(sk.select("n_rows").as[Long].head() == 600L)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = multiset(300, 7).map(v => ("g", v))
    val b = multiset(450, 8).map(v => ("g", v))
    val whole = CountMinSketch
      .build((a ++ b).toDF("g", "v"), Seq("g"), "v", W, D)
      .select("g", "cm", "n_rows")
    val shards = CountMinSketch.build(a.toDF("g", "v"), Seq("g"), "v", W, D)
      .unionByName(CountMinSketch.build(b.toDF("g", "v"), Seq("g"), "v", W, D))
    val merged = CountMinSketch.merge(shards, Seq("g"))
      .select("g", "cm", "n_rows")
    assert(merged.collect().toSeq == whole.collect().toSeq)
  }

  test("inner product bounds the exact equi-join size from above") {
    val a = multiset(400, 11)
    val b = multiset(500, 12)
    val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = ca.keySet.intersect(cb.keySet)
      .toSeq.map(v => ca(v) * cb(v)).sum
    val ska = CountMinSketch.build(a.map(("g", _)).toDF("g", "v"), Seq("g"), "v", W, D)
    val skb = CountMinSketch.build(b.map(("g", _)).toDF("g", "v"), Seq("g"), "v", W, D)
    val est = ska.select(col("cm").as("cma"))
      .crossJoin(skb.select(col("cm").as("cmb")))
      .select(CountMinSketch.innerProduct(col("cma"), col("cmb"), W, D).as("ip"))
      .as[Long].head()
    assert(est >= exact, s"inner product $est < exact $exact")
    assert(est <= exact * 3 + 2000, s"bound blown: $est vs $exact")
  }
}

class ScoreCalibrationSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.ScoreCalibration

  private lazy val df = Seq(
    ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 40L),
    ("a", 5L, 50L),
    ("b", 6L, 999L), // singleton group
    ("c", 7L, 1L), ("c", 8L, 2L)
  ).toDF("src", "id", "score")

  test("percentileRank: integral rank calibration, ties share, n=1 -> 0") {
    val got = ScoreCalibration
      .percentileRank(df, Seq("src"), "score")
      .select("id", "score_ppm").as[(Long, Long)].collect().toMap
    // group a (n=5): ranks 1,2,2,4,5 -> (r-1)*1e6 div 4
    assert(got(1L) == 0L && got(2L) == 250000L && got(3L) == 250000L)
    assert(got(4L) == 750000L && got(5L) == 1000000L)
    assert(got(6L) == 0L) // singleton
    assert(got(7L) == 0L && got(8L) == 1000000L)
  }

  test("keepTopFraction keeps a uniform per-group fraction") {
    val kept = ScoreCalibration
      .keepTopFraction(df, Seq("src"), "score", 0.25)
      .select("id").as[Long].collect().toSet
    // cutoff 750000: a keeps ranks >= 4 (ids 4,5); b's singleton (0) drops;
    // c keeps its max (id 8)
    assert(kept == Set(4L, 5L, 8L))
    assert(ScoreCalibration.keepTopFraction(df, Seq("src"), "score", 1.0)
      .count() == 8) // fraction 1 keeps everything (cutoff 0)
  }

  test("window is partitioned — no global sort in the plan") {
    val plan = ScoreCalibration
      .percentileRank(df, Seq("src"), "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("singlepartition"), plan)
  }
}

class PartitionSkewSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.PartitionSkew

  test("uniform repartition shows ~1.0x skew; single hot key shows ~Px") {
    val even = spark.range(4000).toDF("id").repartition(8, col("id"))
    val s1 = PartitionSkew.summary(even)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s1._2 == 4000L)
    assert(s1._5 < 1300L, s"uniform skew ${s1._5}")
    // every row shares one key -> all rows land in one partition
    val hot = spark.range(4000).toDF("id")
      .withColumn("k", lit(1)).repartition(8, col("k"))
    val s2 = PartitionSkew.summary(hot)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s2._1 == 1L && s2._5 == 1000L) // one non-empty partition
    assert(PartitionSkew.counts(hot).count() == 1L)
  }
}

class HtEstimateSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.HtEstimate
  import org.apache.spark.sql.functions._

  test("invalid inclusion probabilities (null / 0 / negative) are " +
    "counted in n_invalid, not silently dropped from the estimate") {
    val df = Seq(
      ("a", Some(500000L)), // weight 2.000
      ("a", Some(250000L)), // weight 4.000
      ("a", None),          // invalid: null
      ("b", Some(0L)),      // invalid: zero
      ("b", Some(-5L)),     // invalid: negative
      ("b", Some(1000000L)) // weight 1.000
    ).toDF("grp0", "p_ppm")
    val got = HtEstimate.totals(df, "p_ppm", "grp0")
      .orderBy("grp")
      .select("grp", "n_sampled", "n_invalid", "est_count_milli")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 1L, 6000L), ("b", 3L, 2L, 1000L)))
  }

  test("all-invalid group estimates 0 (not null) with full n_invalid") {
    val df = Seq(("z", Option.empty[Long]), ("z", Some(0L))).toDF("g", "p")
    val got = HtEstimate.totals(df, "p", "g")
      .select("n_sampled", "n_invalid", "est_count_milli")
      .as[(Long, Long, Long)].head()
    assert(got == ((2L, 2L, 0L)))
  }
}

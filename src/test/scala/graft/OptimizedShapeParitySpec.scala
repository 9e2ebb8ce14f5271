package graft

import graft.functions.functions.{pair_combos, pq_adc_dist, pq_encode}
import graft.operators.ProductQuantizer
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity pins for the r13 optimization rewrites: each optimized shape
  * must reproduce the formulation it replaced EXACTLY (same rows, same
  * doubles), on data wide enough to exercise caps, ties, and empty
  * edges. These are the operator-internal twins of the DuckDB oracle
  * gate — they hold even for inputs the catalog queries don't reach. */
class OptimizedShapeParitySpec extends SparkSpec {
  import spark.implicits._

  private def det(i: Long, salt: Long): Long =
    // deterministic pseudo-random stream (splitmix64 step)
    { var z = i * 0x9E3779B97F4A7C15L + salt
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4B5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31) }

  test("pair_combos emits exactly the a.id < b.id self-join pair set (incl. 0/1-element postings)") {
    // postings of size 0..6 with distinct ids per posting
    val rows = (0L until 40L).map { p =>
      val n = (det(p, 1) % 7 + 7) % 7
      (p, (0L until n).map(i => (det(p * 10 + i, 2) % 1000 + 1000) % 1000).distinct)
    }
    val df = rows.toDF("p", "ids")
    val viaCombos = df
      .select(explode(pair_combos(col("ids"))).as("pr"))
      .select(col("pr.id_a"), col("pr.id_b"))
      .distinct()
    val ex = df.select(col("p"), explode(col("ids")).as("id"))
    val viaJoin = ex.as("a")
      .join(ex.as("b"),
        col("a.p") === col("b.p") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    assert(viaCombos.exceptAll(viaJoin).count() === 0)
    assert(viaJoin.exceptAll(viaCombos).count() === 0)
  }

  test("postings cap via array_sort(collect_list(struct(h, id))) keeps the row_number window's selection") {
    val cap = 3
    // hot keys: up to 9 members per key, hash ties possible via % 4
    val rows = (0L until 200L).map { i =>
      (s"k${i % 23}", i, s"h${(det(i, 3) % 4 + 4) % 4}")
    }
    val df = rows.toDF("key", "id", "h")
    val viaWindow = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("h"), col("id"))))
      .filter(col("rn") <= cap)
      .select("key", "id")
    val viaAgg = df
      .select(col("key"), struct(col("h"), col("id")).as("r"))
      .groupBy("key")
      .agg(slice(array_sort(collect_list(col("r"))), 1, cap).as("kept"))
      .select(col("key"), explode(col("kept")).as("r"))
      .select(col("key"), col("r.id").as("id"))
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
  }

  test("pair_combos kernel == HOF twin, exact arrays (long + string ids, 0/1-element, order)") {
    import graft.functions.functions.{pair_combos_hof => hofPairs}
    val rows = (0L until 60L).map { p =>
      val n = (det(p, 91) % 6 + 6) % 6
      (p, (0L until n).map(i => (det(p * 10 + i, 92) % 100 + 100) % 100))
    }
    val dfL = rows.toDF("p", "ids")
    val bothL = dfL
      .withColumn("nat", explode_outer(pair_combos(col("ids"))))
      .select(col("p"), col("nat"))
      .exceptAll(dfL
        .withColumn("nat", explode_outer(hofPairs(col("ids"))))
        .select(col("p"), col("nat")))
    assert(bothL.count() === 0)
    val dfS = rows.map { case (p, ids) => (p, ids.map(i => s"id$i")) }
      .toDF("p", "ids")
    val bothS = dfS
      .withColumn("nat", explode_outer(pair_combos(col("ids"))))
      .select(col("p"), col("nat"))
      .exceptAll(dfS
        .withColumn("nat", explode_outer(hofPairs(col("ids"))))
        .select(col("p"), col("nat")))
    assert(bothS.count() === 0)
  }

  test("one-intersection threshold twins == floor-division filters (exhaustive small ranges)") {
    // jaccard: floor(1e6*I/D) >= min  <=>  I*(1e6+min) >= min*(|A|+|B|),
    // D = |A|+|B|-I >= 1; containment: floor(s*I/D) >= T <=> s*I >= T*D
    for (min <- Seq(1L, 333333L, 500000L, 999999L, 1000000L);
         a <- 1 to 12; b <- 1 to 12; i <- 0 to math.min(a, b)) {
      val d = a.toLong + b - i
      val oldP = (1000000L * i) / d >= min
      val newP = i * (1000000L + min) >= min * (a.toLong + b)
      assert(oldP === newP, s"jaccard twin diverged at min=$min a=$a b=$b i=$i")
      val t = math.floor(1000000L * 0.9).toLong
      val dc = math.min(a, b).toLong
      val oldC = (1000000L * i) / dc >= t
      val newC = 1000000L * i >= t * dc
      assert(oldC === newC, s"containment twin diverged at a=$a b=$b i=$i")
    }
  }

  test("collect_min_k == slice(array_sort(collect_list), 1, k) incl. hot keys, ties, duplicates") {
    import graft.functions.functions.collect_min_k
    val cap = 3
    // one deliberately HOT key (80 members, far over cap — the 100 TB
    // skew case the bounded heap exists for), several keys under cap,
    // one exactly at cap, hash ties via % 4, plus duplicate (h, id)
    // entries on the hot key
    val rows = (0L until 200L).map { i =>
      val key = if (i < 80) "hot" else s"k${i % 23}"
      (key, i % 60, s"h${(det(i, 3) % 4 + 4) % 4}")
    }
    val df = rows.toDF("key", "id", "h")
      .select(col("key"), struct(col("h"), col("id")).as("r"))
    val viaSort = df.groupBy("key")
      .agg(slice(array_sort(collect_list(col("r"))), 1, cap).as("kept"))
    val viaHeap = df.groupBy("key")
      .agg(collect_min_k(col("r"), cap).as("kept"))
    // exact ARRAY equality (order included), not just set equality
    assert(viaSort.exceptAll(viaHeap).count() === 0)
    assert(viaHeap.exceptAll(viaSort).count() === 0)
    // and on scalar (long) elements, the containment-posting case
    val ids = rows.toDF("key", "id", "h").select("key", "id")
    val viaSortIds = ids.groupBy("key")
      .agg(slice(array_sort(collect_list(col("id"))), 1, cap + 1).as("kept"))
    val viaHeapIds = ids.groupBy("key")
      .agg(collect_min_k(col("id"), cap + 1).as("kept"))
    assert(viaSortIds.exceptAll(viaHeapIds).count() === 0)
    assert(viaHeapIds.exceptAll(viaSortIds).count() === 0)
  }

  test("bounded containment posting (collect_min_k cap+1 + size filter) == unbounded collect_list shape") {
    import graft.functions.functions.collect_min_k
    val maxDf = 4
    // posting sizes 0..9 across keys: below 2, inside [2, maxDf], at
    // maxDf+1 (the overflow edge), and far above (hot shingle)
    val rows = (0L until 300L).flatMap { i =>
      val key = s"s${i % 37}"
      Seq((key, (det(i, 5) % 500 + 500) % 500))
    } ++ (0L until 60L).map(i => ("hotshingle", i)) // hot: 60 members
    val df = rows.toDF("h", "id")
    def pairsOf(cand: org.apache.spark.sql.DataFrame) = cand
      .select(explode(pair_combos(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val oldShape = pairsOf(
      df.groupBy("h").agg(collect_list(col("id")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf))
    val newShape = pairsOf(
      df.groupBy("h").agg(collect_min_k(col("id"), maxDf + 1).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf))
    assert(oldShape.exceptAll(newShape).count() === 0)
    assert(newShape.exceptAll(oldShape).count() === 0)
  }

  test("capped LSH banding postings shape == row_number window + self-join (hot buckets, md5 hasher)") {
    import graft.operators.{MinHashLSH, MinHashSignature}
    // force HOT buckets: blocks of identical texts share every band
    // hash, so bucket sizes (up to 30) far exceed the cap
    val rows = (0L until 240L).map { i =>
      (i, s"text block ${i % 8} " * 3 + s"tail ${det(i, 81) % 4}")
    }
    val df = rows.toDF("doc_id", "text")
      .withColumn("words", split(col("text"), " "))
    val sigs = MinHashSignature("words", 3, 8)(df)
    val cap = 3
    val hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => md5(c) // string-typed rank hash, the q100 oracle-parity case
    val viaPostings = MinHashLSH.candidatePairs(
      sigs, "doc_id", "minhash_sig", bands = 4, sigLen = 8,
      maxBucketSize = Some(cap), hasher = hasher)
    // the pre-r14 formulation: rank window + filter + self-join
    val bandedAll = sigs.select(
      col("doc_id").as("id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => hasher(concat_ws("|", slice(col("minhash_sig"), b * 2 + 1, lit(2))))))
        .as(Seq("band", "bh")))
    val kept = bandedAll
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("bh"))
          .orderBy(hasher(concat_ws("|", col("id"), col("band"))), col("id"))))
      .filter(col("rn") <= cap)
    val viaWindow = kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    assert(viaPostings.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaPostings).count() === 0)
  }

  test("word_shingles matches the TextShingles HOF (null array, null words, short, unicode)") {
    import graft.operators.TextShingles
    val vocab = Seq("a", "bb", "日本語", "", null, "x y", "zz")
    val rows: Seq[(Long, Option[Seq[String]])] = (0L until 150L).map { r =>
      val n = (det(r, 51) % 8 + 8) % 8
      if (r % 17 == 0) (r, None) // null words array
      else (r, Some((0 until n.toInt).map(i =>
        vocab(((det(r * 19 + i, 52) % 7 + 7) % 7).toInt))))
    }
    val df = rows.toDF("id", "words")
    Seq(1, 2, 3, 5).foreach { n =>
      val both = df
        .withColumn("s_nat", TextShingles.shingles(col("words"), n))
        .withColumn("s_hof", TextShingles.shinglesHof(col("words"), n))
      assert(both.filter(not(col("s_nat") <=> col("s_hof"))).count() === 0,
        s"word_shingles diverged from the HOF twin at n=$n")
    }
  }

  test("md5_window_fps matches the explode+substr+md5+filter+distinct chain (unicode, short, null)") {
    import graft.functions.functions.md5_window_fps
    val texts: Seq[(Long, Option[String])] = Seq(
      (0L, Some("")), (1L, Some("short")), (2L, Some("x" * 19)),
      (3L, Some("y" * 20)), (4L, None),
      (5L, Some("日本語のテキスト" * 10)), // multi-byte windows
      (6L, Some(("abcdefghij" * 8) + ("abcdefghij" * 8))), // repeated windows -> dedup
      (7L, Some("Ünïcødé mixed ascii and combininǵ marks " * 6))
    ) ++ (8L until 40L).map(i =>
      (i, Some((0 until ((det(i, 61) % 300 + 300) % 300).toInt)
        .map(k => (('a' + (det(i * 97 + k, 62) % 26 + 26) % 26).toChar))
        .mkString)))
    val df = texts.toDF("doc_id", "text")
    val viaKernel = df
      .select(col("doc_id"),
        explode(md5_window_fps(col("text"), 20, 1)).as("fp"))
    val viaChain = df
      .select(col("doc_id"), col("text"),
        explode(
          when(length(col("text")) >= 20,
            sequence(lit(1), length(col("text")) - 19))
            .otherwise(array().cast("array<int>"))).as("__i"))
      .select(col("doc_id"), md5(col("text").substr(col("__i"), lit(20))).as("fp"))
      .filter(substring(col("fp"), 1, 1) === "0")
      .distinct()
    assert(viaKernel.exceptAll(viaChain).count() === 0)
    assert(viaChain.exceptAll(viaKernel).count() === 0)
  }

  test("line_stats fractions match the split/filter HOF twins (bullets, ellipsis, dups, paras, null)") {
    import graft.operators.{GopherQuality, RepetitionStats}
    val texts: Seq[(Long, Option[String])] = Seq(
      (0L, Some("")), (1L, None), (2L, Some("\n\n")), (3L, Some("plain line")),
      (4L, Some("- bullet\n* bullet2\n•unicode bullet\n-nodash\nend...")),
      (5L, Some("trail…\nsame\nsame\n\nsame\n\n\npara\n")),
      (6L, Some("a\n\n\nb")), (7L, Some("...\n…\n- \n* \n•")),
      (8L, Some("x\n"))
    ) ++ (9L until 60L).map { i =>
      val lines = (0 until ((det(i, 71) % 12 + 12) % 12).toInt).map { k =>
        val opts = Seq("- item", "* item", "• item", "text...", "text…",
          "dup line", "dup line", "", "plain", "日本語…")
        opts(((det(i * 31 + k, 72) % 10 + 10) % 10).toInt)
      }
      (i, Some(lines.mkString("\n")))
    }
    val df = texts.toDF("id", "text")
    val t = col("text")
    val both = df
      .withColumn("b_nat", GopherQuality.bulletLineFraction(t))
      .withColumn("b_hof", GopherQuality.bulletLineFractionHof(t))
      .withColumn("e_nat", GopherQuality.ellipsisLineFraction(t))
      .withColumn("e_hof", GopherQuality.ellipsisLineFractionHof(t))
      .withColumn("p_nat", GopherQuality.duplicateParagraphFraction(t))
      .withColumn("p_hof", GopherQuality.duplicateParagraphFractionHof(t))
      .withColumn("l_nat", RepetitionStats.duplicateLineFraction(t))
      .withColumn("l_hof", RepetitionStats.duplicateLineFractionHof(t))
    Seq("b", "e", "p", "l").foreach { p =>
      assert(both.filter(not(col(s"${p}_nat") <=> col(s"${p}_hof"))).count() === 0,
        s"line_stats fraction '$p' diverged from the HOF twin")
    }
  }

  test("pq_encode / pq_adc_dist match the zip_with/aggregate HOF formulation bit-for-bit") {
    val m = 4
    val w = 4
    val k = 5
    val dim = m * w
    val vecs = (0L until 60L).map { r =>
      (r, (0 until dim).map(i => (det(r * 100 + i, 7) % 1000).toDouble / 250.0))
    }
    val df = vecs.toDF("id", "emb")
    val cbs: Seq[Seq[Seq[Double]]] = (0 until m).map(mi =>
      (0 until k).map(j =>
        (0 until w).map(i => (det((mi * k + j) * 50 + i, 11) % 1000).toDouble / 250.0)))

    def l2sqHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)

    // encode: HOF twin (the formulation encode() used before r13)
    val e = col("emb").cast(ArrayType(DoubleType))
    val hofCodes = array((0 until m).map { mi =>
      val sub = slice(e, mi * w + 1, w)
      val cands = array(cbs(mi).zipWithIndex.map { case (c, j) =>
        struct(l2sqHof(sub, typedlit(c)).as("d"), lit(j.toLong).as("code"))
      }: _*)
      aggregate(slice(cands, 2, k - 1), element_at(cands, 1),
        (acc, x) => when(x.getField("d") < acc.getField("d"), x).otherwise(acc)
      ).getField("code")
    }: _*)
    val both = df
      .withColumn("c_hof", hofCodes)
      .withColumn("c_nat", pq_encode(e, cbs))
    assert(both.filter(col("c_hof") =!= col("c_nat")).count() === 0)

    // adc dist: HOF twin over the native codes
    val hofDist = (0 until m).map { mi =>
      val cb = typedlit(cbs(mi))
      l2sqHof(slice(e, mi * w + 1, w),
        element_at(cb, (element_at(col("c_nat"), mi + 1) + 1).cast("int")))
    }.reduce(_ + _)
    val d = both
      .withColumn("d_hof", hofDist)
      .withColumn("d_nat", pq_adc_dist(e, col("c_nat"), cbs))
    // bit-for-bit: same accumulation order, so exact equality is required
    assert(d.filter(col("d_hof") =!= col("d_nat")).count() === 0)

    // and the operator entry points still agree with themselves end-to-end
    val enc = ProductQuantizer.encode(df, "emb", cbs)
    val top = ProductQuantizer.adcTopK(enc, df.filter(col("id") < 3), "emb", "id",
      k = 4, cbs)
    assert(top.count() === 12)
  }

  test("top/dup_ngram_chars match the HOF gram-count formulation (ties, nulls, unicode, < n words)") {
    import graft.operators.GopherQuality
    // word streams from a tiny vocab (forced duplicate grams + count
    // ties), lengths 0..9 straddling every n, null words, and
    // multi-byte unicode words (length must count chars, not bytes)
    val vocab = Seq("a", "bb", "ccc", "日本語", "a", null)
    val rows = (0L until 120L).map { r =>
      val n = (det(r, 31) % 10 + 10) % 10
      (r,
        (0 until n.toInt).map(i => vocab(((det(r * 17 + i, 32) % 6 + 6) % 6).toInt)),
        s"text-padding-${"x" * ((det(r, 33) % 50 + 50) % 50).toInt}")
    }
    val df = rows.toDF("id", "words", "text")
    Seq(1, 2, 3, 5).foreach { n =>
      val both = df
        .withColumn("t_nat", GopherQuality.topNgramCharFraction(col("text"), col("words"), n))
        .withColumn("t_hof", GopherQuality.topNgramCharFractionHof(col("text"), col("words"), n))
        .withColumn("d_nat", GopherQuality.dupNgramCharFraction(col("text"), col("words"), n))
        .withColumn("d_hof", GopherQuality.dupNgramCharFractionHof(col("text"), col("words"), n))
      // bit-for-bit: both sides divide the same exact integers
      assert(both.filter(col("t_nat") =!= col("t_hof")).count() === 0,
        s"topNgramCharFraction diverged from the HOF twin at n=$n")
      assert(both.filter(col("d_nat") =!= col("d_hof")).count() === 0,
        s"dupNgramCharFraction diverged from the HOF twin at n=$n")
    }
  }

  test("argmax_cosine matches the struct-fold twin (raw + scaled modes, ties, NaN sims)") {
    import graft.functions.functions.argmax_cosine
    val dim = 6
    val cents: Seq[Seq[Double]] = Seq(
      (0 until dim).map(i => (det(i, 41) % 100).toDouble / 25.0),
      (0 until dim).map(i => (det(i, 42) % 100).toDouble / 25.0),
      (0 until dim).map(i => (det(i, 41) % 100).toDouble / 25.0), // duplicate of 0 -> forced sim tie
      Seq.fill(dim)(0.0) // zero centroid -> NaN cosine candidate
    )
    val rows = (0L until 150L).map { r =>
      val zero = r % 29 == 0 // zero rows -> every sim NaN
      (r, (0 until dim).map(i =>
        if (zero) 0.0 else (det(r * 13 + i, 43) % 200).toDouble / 50.0 - 2.0))
    }
    val df = rows.toDF("id", "emb")
    val e = col("emb").cast(ArrayType(DoubleType))
    def foldTwin(key: Seq[Double] => org.apache.spark.sql.Column,
        pick: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = {
      val cands = array(cents.zipWithIndex.map { case (c, j) =>
        struct(key(c).as("k"), lit(j).as("idx"))
      }: _*)
      aggregate(slice(cands, 2, cents.length - 1), element_at(cands, 1),
        (acc, x) => when(pick(x.getField("k"), acc.getField("k")), x).otherwise(acc)
      ).getField("idx")
    }
    // raw mode: when(x.sim > acc.sim) — Spark's NaN-beats-all `>`
    val raw = df
      .withColumn("i_hof", foldTwin(
        c => graft.functions.functions.cosine_sim(e, typedlit(c)),
        (x, acc) => x > acc))
      .withColumn("i_nat", argmax_cosine(e, cents).getField("idx"))
    assert(raw.filter(col("i_hof") =!= col("i_nat")).count() === 0,
      "argmax_cosine raw mode diverged from the struct fold")
    // winner's sim must equal the recomputed cosine of that winner
    val sims = raw
      .withColumn("s_nat", argmax_cosine(e, cents).getField("sim"))
      .withColumn("s_ref",
        graft.functions.functions.cosine_sim(e,
          element_at(typedlit(cents), col("i_nat") + 1)))
    assert(sims.filter(!(col("s_nat") === col("s_ref"))).count() === 0)
    // scaled mode: when(x.negsim < acc.negsim) over -floor(scale·cos)
    val scale = 1000000L
    val scaled = df
      .withColumn("i_hof", foldTwin(
        c => -floor(lit(scale) * graft.functions.functions.cosine_sim(e, typedlit(c)))
          .cast(LongType),
        (x, acc) => x < acc))
      .withColumn("i_nat", argmax_cosine(e, cents, scale).getField("idx"))
    assert(scaled.filter(col("i_hof") =!= col("i_nat")).count() === 0,
      "argmax_cosine scaled mode diverged from the negsim fold")

    // NULL contract (intended semantics, documented on the kernel): a
    // null embedding yields a NULL result — the old struct fold silently
    // assigned null rows to the FIRST centroid (null sim kept the
    // initial accumulator). Catalog callers never feed null embeddings;
    // this row pins the deliberate null-in/null-out divergence.
    val nullRows = Seq((0L, Some(Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0))), (1L, None))
      .toDF("id", "emb")
    val nulled = nullRows
      .withColumn("b", argmax_cosine(col("emb").cast(ArrayType(DoubleType)), cents))
    assert(nulled.filter(col("id") === 1L && col("b").isNotNull).count() === 0,
      "argmax_cosine must be null for a null embedding")
    assert(nulled.filter(col("id") === 0L && col("b").isNull).count() === 0)
  }

  test("dot_product matches the zip_with/aggregate HOF (mismatched lengths, null elements, empty)") {
    import graft.functions.functions.dot_product
    val rows = (0L until 200L).map { r =>
      def arr(salt: Long, n: Long) = (0L until n).map { i =>
        val v = det(r * 7 + i, salt)
        if (v % 11 == 0) null else java.lang.Double.valueOf((v % 500).toDouble / 100.0)
      }
      val na = (det(r, 51) % 6 + 6) % 6
      val nb = if (r % 5 == 0) (det(r, 52) % 6 + 6) % 6 else na // 1/5 mismatched
      (r, arr(53, na), arr(54, nb))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val both = df
      .withColumn("d_hof", hof)
      .withColumn("d_nat", dot_product(col("a"), col("b")))
    assert(both.filter(!(col("d_hof") <=> col("d_nat"))).count() === 0,
      "dot_product diverged from the HOF fold (incl. null contract)")
  }

  test("char_ngrams matches the split/concat HOF (unicode, surrogates, short/empty, case fold)") {
    import graft.operators.LangIdNgram
    val pieces = Seq("ab", "Ж", "日本", "🌍", "x", " ", "ÉÈ", "")
    val rows = (0L until 150L).map { r =>
      val k = (det(r, 81) % 9 + 9) % 9
      (r, (0 until k.toInt)
        .map(i => pieces(((det(r * 13 + i, 82) % 8 + 8) % 8).toInt))
        .mkString)
    }
    val df = rows.toDF("id", "text")
    Seq(1, 2, 3).foreach { n =>
      val both = df
        .withColumn("nat", to_json(LangIdNgram.charNgrams(col("text"), n)))
        .withColumn("hof", to_json(LangIdNgram.charNgramsHof(col("text"), n)))
      assert(both.filter(!(col("nat") <=> col("hof"))).count() === 0,
        s"char_ngrams diverged from the HOF at n=$n")
    }
  }

  test("top_ngrams_ranked matches the explode+count+window docTop (ties, unicode, short text)") {
    import graft.functions.functions.top_ngrams_ranked
    import graft.operators.LangIdNgram
    val pieces = Seq("abab", "Жa", "日本日本", "🌍a🌍", "xy", " ", "aa", "")
    val rows = (0L until 120L).map { r =>
      val k = (det(r, 91) % 10 + 10) % 10
      (r, (0 until k.toInt)
        .map(i => pieces(((det(r * 7 + i, 92) % 8 + 8) % 8).toInt))
        .mkString)
    }
    val df = rows.toDF("id", "text")
    Seq((1, 3), (3, 5), (3, 100)).foreach { case (n, topN) =>
      val nat = df.select(col("id").as("__li_id"),
          explode(top_ngrams_ranked(lower(col("text")), n, topN)).as("g"))
        .select(col("__li_id"), col("g.gram").as("gram"), col("g.rank").as("__li_dr"))
      val sql = LangIdNgram.docTopSql(df, "id", "text", topN, n)
      assert(nat.exceptAll(sql).count() === 0 && sql.exceptAll(nat).count() === 0,
        s"top_ngrams_ranked diverged from the SQL docTop at n=$n topN=$topN")
    }
  }

  test("ct_classify kernel matches the SQL classify (distances, und rows, tie languages)") {
    import graft.operators.LangIdNgram
    val pieces = Seq("the cat sat", "der Hund lief", "le chat noir", "xyz", "ab", "")
    val train = (0L until 60L).map { r =>
      val l = Seq("de", "en", "fr")(((det(r, 95) % 3 + 3) % 3).toInt)
      (l, (0 until 4).map(i =>
        pieces(((det(r * 5 + i, 96) % 6 + 6) % 6).toInt)).mkString(" "))
    }.toDF("lang", "text")
    val profiles = LangIdNgram.trainProfiles(train, "lang", "text", topN = 20, n = 3)
    val docs = (0L until 80L).map { r =>
      val k = (det(r, 97) % 5 + 5) % 5
      (r, (0 until k.toInt).map(i =>
        pieces(((det(r * 3 + i, 98) % 6 + 6) % 6).toInt)).mkString(" "))
    }.toDF("id", "text")
    val nat = LangIdNgram.classify(docs, "id", "text", profiles, topN = 20, n = 3)
      .select(col("id"), col("pred_lang"), col("dist"))
    val sql = LangIdNgram.classifySql(docs, "id", "text", profiles, topN = 20, n = 3)
      .select(col("id"), col("pred_lang"), col("dist"))
    assert(nat.exceptAll(sql).count() === 0 && sql.exceptAll(nat).count() === 0,
      "ct_classify diverged from the SQL classify")
  }

  test("intersect_size matches size(array_intersect) (duplicates, nulls, empties)") {
    import graft.functions.functions.intersect_size
    val vocab = Seq("x", "yy", "zzz", "x", null, "w", "日本")
    val rows = (0L until 300L).map { r =>
      def arr(salt: Long) = {
        val n = (det(r, salt) % 8 + 8) % 8
        (0L until n).map(i => vocab(((det(r * 11 + i, salt + 1) % 7 + 7) % 7).toInt))
      }
      (r, arr(71), arr(73))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df
      .withColumn("s_ref", size(array_intersect(col("a"), col("b"))))
      .withColumn("s_nat", intersect_size(col("a"), col("b")))
    assert(both.filter(!(col("s_ref") <=> col("s_nat"))).count() === 0,
      "intersect_size diverged from size(array_intersect)")
  }

  test("pca_project matches the HOF projection (normal, wrong-length, null-element rows)") {
    import graft.operators.PcaWhiten
    val d = 8
    val model = PcaWhiten.Model(
      means = Array.tabulate(d)(i => (det(i, 61) % 100).toDouble / 50.0),
      eigvals = Array.tabulate(d)(i => (det(i, 62) % 100).toDouble / 10.0 + 0.1),
      components = Array.tabulate(d)(r =>
        Array.tabulate(d)(i => (det(r * d + i, 63) % 200).toDouble / 100.0 - 1.0)))
    val rows = (0L until 100L).map { r =>
      val n = if (r % 13 == 0) d - 1 else if (r % 17 == 0) d + 2 else d
      (r, (0 until n).map { i =>
        val v = det(r * 19 + i, 64)
        if (r % 23 == 0 && i == 2) null
        else java.lang.Double.valueOf((v % 400).toDouble / 100.0 - 2.0)
      })
    }
    val df = rows.toDF("id", "emb")
    val both = PcaWhiten.projectHof(
      PcaWhiten.project(df, "emb", model, dest = "w_nat"),
      "emb", model, dest = "w_hof")
      .select(col("id"), to_json(col("w_nat")).as("n"), to_json(col("w_hof")).as("h"))
    assert(both.filter(!(col("n") <=> col("h"))).count() === 0,
      "pca_project diverged from the HOF projection")
  }

  test("winnow_select matches the HOF window-min fold (ties, n < w, duplicate hashes)") {
    import graft.operators.Winnowing
    // hash streams with FORCED ties (small modulus) and lengths 1..14
    // straddling the window size
    val rows = (0L until 80L).map { r =>
      val n = (det(r, 21) % 14 + 14) % 14 + 1
      (r, (0 until n.toInt).map(i => (det(r * 31 + i, 22) % 7 + 7) % 7))
    }
    val df = rows.toDF("id", "grams")
    Seq(1, 3, 4, 8).foreach { w =>
      val both = df
        .withColumn("nat", graft.functions.functions.winnow_select(col("grams"), w))
        .withColumn("hof", Winnowing.selectHof(col("grams"), w))
        .select(col("id"),
          to_json(col("nat")).as("nat"), to_json(col("hof")).as("hof"))
      assert(both.filter(col("nat") =!= col("hof")).count() === 0,
        s"winnow_select diverged from the HOF fold at w=$w")
    }
  }
}

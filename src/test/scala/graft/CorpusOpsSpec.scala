package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- ParagraphDedup

  test("ParagraphDedup keeps the globally-first occurrence of each line") {
    val df = Seq(
      (0L, "alpha\nbeta\ngamma"),
      (1L, "beta\ndelta"),
      (2L, "gamma\nalpha\nepsilon")
    ).toDF("id", "text")
    val out = ParagraphDedup("text", "id")(df)
      .orderBy("id")
      .select("id", "text")
      .as[(Long, String)]
      .collect()
    assert(out === Array(
      (0L, "alpha\nbeta\ngamma"), // all first occurrences
      (1L, "delta"),              // beta seen in doc 0
      (2L, "epsilon")             // gamma+alpha seen in doc 0
    ))
  }

  test("ParagraphDedup collapses a fully-duplicated doc to the empty string") {
    val df = Seq((0L, "x\ny"), (1L, "y\nx")).toDF("id", "text")
    val out = ParagraphDedup("text", "id")(df)
      .orderBy("id").select("text").as[String].collect()
    assert(out === Array("x\ny", ""))
  }

  test("ParagraphDedup dedups repeats within one document") {
    val df = Seq((5L, "a\na\nb\na")).toDF("id", "text")
    val out = ParagraphDedup("text", "id")(df)
      .select("text").as[String].collect()
    assert(out === Array("a\nb"))
  }

  test("ParagraphDedup with destinationField keeps the original column") {
    val df = Seq((0L, "p\nq"), (1L, "q\nr")).toDF("id", "text")
    val out = ParagraphDedup("text", "id", "\n", Some("clean"))(df)
      .orderBy("id").select("text", "clean").as[(String, String)].collect()
    assert(out === Array(("p\nq", "p\nq"), ("q\nr", "r")))
  }

  // ---------------------------------------------------------------- LmScore

  test("LmScore.familiarity matches a hand computation") {
    // corpus bigrams: "a b" x2 ("a b c", "a b"), "b c" x1
    val docs = Seq(
      (0L, Seq("a", "b", "c")), // grams: a b (2), b c (1) -> (2+1)*1e6/2
      (1L, Seq("a", "b")),      // grams: a b (2)          -> 2e6/1
      (2L, Seq("z"))            // <2 words -> 0 grams, score 0
    ).toDF("id", "words")
    val out = LmScore.familiarity(docs, "id", "words", docs, "words", n = 2)
      .orderBy("id")
      .select("id", "n_grams", "lm_score")
      .as[(Long, Long, Long)]
      .collect()
    assert(out === Array(
      (0L, 2L, 1500000L),
      (1L, 1L, 2000000L),
      (2L, 0L, 0L)
    ))
  }

  test("LmScore.familiarity scores against a separate reference corpus") {
    val ref = Seq((0L, Seq("x", "y", "x", "y"))).toDF("id", "words")
    // ref bigrams: x y (2), y x (1)
    val docs = Seq((7L, Seq("x", "y", "q"))).toDF("id", "words")
    // doc grams: "x y" (ref count 2), "y q" (absent -> 0); mean = 1e6
    val out = LmScore.familiarity(docs, "id", "words", ref, "words", n = 2)
      .select("n_grams", "lm_score").as[(Long, Long)].collect()
    assert(out === Array((2L, 1000000L)))
  }

  // ---------------------------------------------------------------- PackSequences

  test("PackSequences matches a sequential brute-force layout") {
    val lens = Seq(5L, 0L, 31L, 32L, 1L, 64L, 7L, 3L, 90L, 2L)
    val df = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }
      .toDF("id", "n")
    val out = PackSequences("id", "n", chunkSize = 32, bucketSpan = 3)(df)
      .orderBy("id")
      .select("id", "start_offset", "end_offset", "first_chunk", "last_chunk")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
    var off = 0L
    lens.zipWithIndex.foreach { case (n, i) =>
      val (id, s, e, fc, lc) = out(i)
      assert(id === i.toLong)
      assert(s === off)
      assert(e === off + n)
      assert(fc === s / 32)
      assert(lc === (if (n > 0) (e - 1) / 32 else s / 32))
      off += n
    }
  }

  test("PackSequences is invariant to bucketSpan") {
    val df = (0L until 100L).map(i => (i, (i * 7 % 13) + 1)).toDF("id", "n")
    def run(span: Long) =
      PackSequences("id", "n", chunkSize = 16, bucketSpan = span)(df)
        .orderBy("id")
        .select("id", "start_offset", "first_chunk", "last_chunk")
        .as[(Long, Long, Long, Long)]
        .collect()
        .toSeq
    assert(run(1) === run(7))
    assert(run(7) === run(1L << 20))
  }

  test("PackSequences keeps the tiny window off the data: bucket prefix is broadcast") {
    val df = (0L until 50L).map(i => (i, i % 5)).toDF("id", "n")
    val packed = PackSequences("id", "n", chunkSize = 8, bucketSpan = 10)(df)
    packed.collect() // materialize so AQE's final plan is available
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  // ---------------------------------------------------------------- survivor policy

  test("dedupClustersBy keeps the highest-quality member of each near-dup cluster") {
    // ids 0,1,2 are near-identical (one transitive cluster); 1 is longest.
    // id 9 is unrelated and must survive untouched.
    val base = (1 to 30).map(i => s"w$i")
    val docs = Seq(
      (0L, base),
      (1L, base ++ Seq("extra", "tail", "words")),
      (2L, base.updated(0, "changed")),
      (9L, (1 to 30).map(i => s"z$i"))
    ).toDF("id", "words")
    val out = MinHashLSH.dedupClustersBy(
      docs, "words", "id", qualityCol = size(col("words")),
      minJaccard = 0.5)
      .select("id").as[Long].collect().sorted
    assert(out === Array(1L, 9L))
  }

  test("dedupClustersBy ties break to the smallest id") {
    val base = (1 to 30).map(i => s"w$i")
    val docs = Seq(
      (3L, base), (7L, base), (5L, base) // identical => same length
    ).toDF("id", "words")
    val out = MinHashLSH.dedupClustersBy(
      docs, "words", "id", qualityCol = size(col("words")),
      minJaccard = 0.5)
      .select("id").as[Long].collect()
    assert(out === Array(3L))
  }

  test("nearDupAgainst flags only incoming docs near-duplicating the existing corpus") {
    val base = (1 to 40).map(i => s"w$i")
    val existing = MinHashSignature("words")(
      Seq((0L, base), (2L, (1 to 40).map(i => s"q$i"))).toDF("id", "words"))
    val incoming = MinHashSignature("words")(
      Seq(
        (1L, base.updated(0, "changed")),     // near-dup of existing 0
        (3L, (1 to 40).map(i => s"n$i"))      // unrelated
      ).toDF("id", "words"))
    val out = MinHashLSH.nearDupAgainst(existing, incoming, "id",
      minJaccard = 0.5)
      .orderBy("id").select("id", "dup_of_existing")
      .as[(Long, Boolean)].collect()
    assert(out === Array((1L, true), (3L, false)))
  }

  test("nearDupAgainst never pairs incoming docs with each other") {
    // two incoming docs identical to EACH OTHER but unlike the corpus:
    // incremental dedup must not flag them (batch-internal dedup is a
    // separate pass)
    val dup = (1 to 40).map(i => s"z$i")
    val existing = MinHashSignature("words")(
      Seq((0L, (1 to 40).map(i => s"w$i"))).toDF("id", "words"))
    val incoming = MinHashSignature("words")(
      Seq((1L, dup), (3L, dup)).toDF("id", "words"))
    val out = MinHashLSH.nearDupAgainst(existing, incoming, "id",
      minJaccard = 0.5)
      .select("dup_of_existing").as[Boolean].collect()
    assert(out === Array(false, false))
  }

  test("packChunks reproduces the concatenated stream exactly") {
    val df = Seq(
      (0L, Seq(1L, 2L, 3L)),
      (1L, Seq(4L, 5L)),
      (2L, Seq(6L, 7L, 8L, 9L))
    ).toDF("id", "toks")
    val out = PackSequences.packChunks(df, "id", "toks", chunkSize = 4,
      bucketSpan = 2)
      .orderBy("chunk")
      .select("chunk", "tokens").as[(Long, Seq[Long])].collect()
    assert(out === Array(
      (0L, Seq(1L, 2L, 3L, 4L)),  // doc 1 straddles the boundary
      (1L, Seq(5L, 6L, 7L, 8L)),
      (2L, Seq(9L))               // short tail kept by default
    ))
  }

  test("packChunks dropLast yields strictly rectangular rows") {
    val df = Seq((0L, (1L to 10L))).toDF("id", "toks")
    val out = PackSequences.packChunks(df, "id", "toks", chunkSize = 4,
      dropLast = true)
      .select("tokens").as[Seq[Long]].collect()
    assert(out.forall(_.size == 4) && out.length == 2)
  }

  // ---------------------------------------------------------------- DeterministicShuffle

  test("DeterministicShuffle is a stable permutation; salt re-keys it") {
    val df = (0L until 100L).map(i => (i, s"d$i")).toDF("id", "payload")
    def order(salt: String) =
      DeterministicShuffle("id", salt)(df).select("id").as[Long].collect().toSeq
    val e0 = order("epoch0")
    assert(e0.sorted == (0L until 100L))     // permutation, nothing lost
    assert(e0 == order("epoch0"))            // reproducible
    assert(e0 != (0L until 100L))            // actually shuffled
    assert(e0 != order("epoch1"))            // epoch salt re-keys
  }

  // ---------------------------------------------------------------- FingerprintOverlap

  test("FingerprintOverlap keeps pairs sharing at least minShared fingerprints") {
    val docs = Seq(
      (0L, Seq("f1", "f2", "f3")),
      (1L, Seq("f2", "f3", "f9")), // shares f2,f3 with 0
      (2L, Seq("f3", "zz"))        // shares only f3 with 0 and 1
    ).toDF("id", "fp")
    val out = FingerprintOverlap.candidatePairs(docs, "id", "fp",
      minShared = 2)
      .select("id_a", "id_b", "shared").as[(Long, Long, Long)].collect()
    assert(out === Array((0L, 1L, 2L)))
  }

  test("FingerprintOverlap cap bounds a hot fingerprint's pair fan-out") {
    val hot = (0L until 6L).map(i => (i, Seq("hotfp")))
    val docs = hot.toDF("id", "fp")
    val uncapped = FingerprintOverlap.candidatePairs(docs, "id", "fp",
      minShared = 1).count()
    val capped = FingerprintOverlap.candidatePairs(docs, "id", "fp",
      minShared = 1, maxBucketSize = Some(2)).count()
    assert(uncapped === 15L) // 6 choose 2
    assert(capped === 1L)    // cap 2 -> one pair from the kept subset
  }

  // ---------------------------------------------------------------- Mixtures

  test("waterFill matches the greedy hand computation in the mixed regime") {
    // supplies (maxEpochs=1): a=10, b=20, c=100; budget 60.
    // a: 10*3=30 <= 60 -> full. b: 20*2=40 <= 50 -> full. c: 100 > 30 -> λ=30.
    val counts = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("src", "n")
    val out = Mixtures.waterFill(counts, "src", "n", budget = 60L)
      .orderBy("src")
      .select("src", "alloc").as[(String, Long)].collect()
    assert(out === Array(("a", 10L), ("b", 20L), ("c", 30L)))
  }

  test("waterFill allocates everything when the budget covers all supplies") {
    val counts = Seq(("a", 5L), ("b", 7L)).toDF("src", "n")
    val out = Mixtures.waterFill(counts, "src", "n", budget = 1000L,
      maxEpochs = 2L)
      .orderBy("src")
      .select("src", "supply", "alloc").as[(String, Long, Long)].collect()
    assert(out === Array(("a", 10L, 10L), ("b", 14L, 14L)))
  }

  test("waterFill splits the level evenly when nothing fits fully") {
    // equal big sources, tiny budget: everyone gets budget div k
    val counts = Seq(("a", 50L), ("b", 50L), ("c", 50L)).toDF("src", "n")
    val out = Mixtures.waterFill(counts, "src", "n", budget = 31L)
      .select("alloc").as[Long].collect()
    assert(out.toSeq === Seq(10L, 10L, 10L))
  }

  test("waterFill total allocation never exceeds the budget") {
    val counts = Seq(("a", 13L), ("b", 29L), ("c", 7L), ("d", 101L))
      .toDF("src", "n")
    for (b <- Seq(0L, 10L, 50L, 120L, 500L)) {
      val allocs = Mixtures.waterFill(counts, "src", "n", budget = b,
        maxEpochs = 3L)
        .select("alloc").as[Long].collect()
      assert(allocs.sum <= math.max(b, 0L) ||
        allocs.sum === Seq(13L, 29L, 7L, 101L).map(_ * 3).sum)
      assert(allocs.forall(_ >= 0L))
    }
  }

  // ---------------------------------------------------------------- ExactSubstrDedup

  test("ExactSubstrDedup cuts a copied passage from the later doc only") {
    val df = Seq(
      (0L, "ABCDEFGHIJKL"),
      (1L, "xxABCDEFGHIJKLyy")
    ).toDF("id", "text")
    val out = ExactSubstrDedup
      .removeDuplicateSpans(df, "id", "text", gramLen = 8)
      .orderBy("id").select("text").as[String].collect()
    // doc 0 holds every gram's first occurrence; doc 1 loses exactly the
    // copied span (boundary grams straddling into xx/yy are unique)
    assert(out === Array("ABCDEFGHIJKL", "xxyy"))
  }

  test("ExactSubstrDedup keeps the first of a within-doc repeat") {
    val df = Seq((7L, "ABCDEFGH--ABCDEFGH")).toDF("id", "text")
    val out = ExactSubstrDedup
      .removeDuplicateSpans(df, "id", "text", gramLen = 8)
      .select("text").as[String].head()
    assert(out === "ABCDEFGH--")
  }

  test("ExactSubstrDedup: identical docs — first survives, copy empties") {
    val df = Seq((0L, "ABCDEFGHIJ"), (1L, "ABCDEFGHIJ")).toDF("id", "text")
    val out = ExactSubstrDedup
      .removeDuplicateSpans(df, "id", "text", gramLen = 8)
      .orderBy("id").select("text").as[String].collect()
    assert(out === Array("ABCDEFGHIJ", ""))
  }

  test("ExactSubstrDedup passes docs shorter than gramLen through") {
    val df = Seq((0L, "tiny"), (1L, "tiny")).toDF("id", "text")
    val out = ExactSubstrDedup
      .removeDuplicateSpans(df, "id", "text", gramLen = 8,
        destinationField = Some("dedup"))
      .orderBy("id").select("dedup").as[String].collect()
    assert(out === Array("tiny", "tiny"))
  }

  test("ExactSubstrDedup matches a brute-force reference on random docs") {
    def brute(docs: Seq[(Long, String)], L: Int): Map[Long, String] = {
      val occ = collection.mutable.Map[String, List[(Long, Int)]]()
      for ((id, t) <- docs; p <- 1 to t.length - L + 1) {
        val g = t.substring(p - 1, p - 1 + L)
        occ(g) = (id, p) :: occ.getOrElse(g, Nil)
      }
      val marked = collection.mutable
        .Map[Long, Set[Int]]().withDefaultValue(Set.empty)
      for ((_, os) <- occ if os.size > 1) {
        for ((id, p) <- os.sortBy(identity).tail) marked(id) += p
      }
      docs.map { case (id, t) =>
        val cov = Array.fill(t.length + 2)(false)
        for (p <- marked(id); c <- p until math.min(p + L, t.length + 1))
          cov(c) = true
        id -> (1 to t.length).filterNot(cov).map(c => t.charAt(c - 1)).mkString
      }.toMap
    }
    val rnd = new scala.util.Random(41)
    val docs = (0L until 30L).map { id =>
      id -> Array.fill(20 + rnd.nextInt(30))(('a' + rnd.nextInt(3)).toChar).mkString
    }
    val expected = brute(docs, 4)
    val out = ExactSubstrDedup
      .removeDuplicateSpans(docs.toDF("id", "text"), "id", "text",
        gramLen = 4, hasher = c => md5(c))
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(out === expected)
  }

  // ---------------------------------------------------------------- CorpusStats

  test("CorpusStats.topNgrams orders by count desc then gram, cut at k") {
    val docs = Seq(
      (0L, Seq("a", "b", "a", "b")), // bigrams: a b, b a, a b
      (1L, Seq("b", "a"))            // b a
    ).toDF("id", "words")
    val out = CorpusStats.topNgrams(docs, "words", n = 2, k = 1)
      .as[(String, Long)].collect()
    assert(out === Array(("a b", 2L))) // ties (b a also 2) broken by gram asc
  }

  test("CorpusStats.invertedIndex: true df, capped in-order postings") {
    val docs = Seq(
      (3L, Seq("x", "y", "x")), // x counted once per doc
      (1L, Seq("x", "z")),
      (2L, Seq("x", "y")),
      (4L, Seq("x"))
    ).toDF("doc_id", "words")
    val out = CorpusStats.invertedIndex(docs, "doc_id", "words", maxPostings = 2)
      .orderBy("term")
      .as[(String, Long, Seq[Long])].collect()
    // df stays the TRUE count even where the cap binds (x: 4 docs, 2 kept)
    assert(out === Array(
      ("x", 4L, Seq(1L, 2L)),
      ("y", 2L, Seq(2L, 3L)),
      ("z", 1L, Seq(1L))
    ))
  }

  test("CorpusStats.phraseMatches: adjacency required, overlaps counted, dup-word phrases") {
    val docs = Seq(
      (1L, Seq("new", "york", "city")), // match at 0
      (2L, Seq("york", "new")), // both terms, wrong order: NO match
      (3L, Seq("new", "jersey", "york")), // both terms, not adjacent: NO
      (4L, Seq("a", "new", "york", "b", "new", "york")), // two matches
      (5L, Seq("new")) // too short
    ).toDF("doc_id", "words")
    val out = CorpusStats.phraseMatches(docs, "doc_id", "words",
      Seq("new", "york"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((1L, 0L)), 4L -> ((2L, 1L))))
    // overlapping + repeated-word phrase: "a a" in "a a a" starts at 0 and 1
    val rep = Seq((9L, Seq("a", "a", "a"))).toDF("doc_id", "words")
    val r = CorpusStats.phraseMatches(rep, "doc_id", "words", Seq("a", "a"))
      .as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((9L, 2L, 0L)))
    // single-word phrase degenerates to term positions
    val one = CorpusStats.phraseMatches(docs, "doc_id", "words", Seq("york"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> x._2).toMap
    assert(one == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("CorpusStats.topCollocations: integer lift replicated by hand") {
    // corpus: "a b" ×3 plus lone c's; unigrams a=3 b=3 c=4
    val docs = Seq(
      (0L, Seq("a", "b", "c", "a", "b")),
      (1L, Seq("a", "b", "c", "c", "c"))
    ).toDF("doc_id", "words")
    val out = CorpusStats
      .topCollocations(docs, "words", k = 10, minCount = 2L)
      .as[(String, Long, Long)].collect()
    val lifts = out.map(t => t._1 -> (t._2, t._3)).toMap
    // c_ab=3, c_a=3, c_b=3 → lift = 1e12*3/9
    assert(lifts("a b") == (3L, 1000000000000L * 3 / 9))
    // "b c": c=2, b=3, c=4 → 1e12*2/12
    assert(lifts("b c") == (2L, 1000000000000L * 2 / 12))
    // minCount drops singletons ("c a" appears once)
    assert(!lifts.contains("c a"))
    // ranking: "a b" (333e9) above "b c" (166e9) above "c c" (2/16)
    assert(out.map(_._1).take(3).toSeq == Seq("a b", "b c", "c c"))
  }

  test("BoilerplateLines drops every occurrence past the frequency bar") {
    val df = Seq(
      (1L, "banner\nunique a\nbanner"),
      (2L, "banner\nunique b"),
      (3L, "unique c"),
      (4L, "banner")
    ).toDF("id", "text")
    val out = rows(graft.operators.BoilerplateLines("text", "id",
      minCount = 3)(df).orderBy("id").select("id", "text"))
    // banner occurs 4x >= 3 -> gone everywhere, including BOTH copies in
    // doc 1; below-threshold lines stay put; all-boilerplate doc -> ""
    assert(out == Seq(
      Seq(1L, "unique a"), Seq(2L, "unique b"),
      Seq(3L, "unique c"), Seq(4L, "")))
    // at a higher bar nothing reaches the threshold
    val loose = rows(graft.operators.BoilerplateLines("text", "id",
      minCount = 5)(df).orderBy("id").select("text"))
    assert(loose == Seq(Seq("banner\nunique a\nbanner"),
      Seq("banner\nunique b"), Seq("unique c"), Seq("banner")))
  }

  test("ngramDiversity: golden counts, short docs drop, repetition lowers ratio") {
    import graft.operators.CorpusStats
    val df = Seq(
      ("g1", Seq("a", "b", "a", "b")), // bigrams: "a b", "b a", "a b"
      ("g1", Seq("a", "b", "c")),      // bigrams: "a b", "b c"
      ("g1", Seq("x")),                // < n words: contributes nothing
      ("g2", Seq("p", "p", "p", "p"))  // "p p" ×3 — maximal repetition
    ).toDF("src", "words")
    val out = CorpusStats.ngramDiversity(df, "words", n = 2, "src")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == (("g1", 5L, 3L, 0.6)))
    assert(out(1) == (("g2", 3L, 1L, 1.0/ 3.0)))
    // hasher swap (md5) counts the same distincts
    val md5Out = CorpusStats.ngramDiversity(df, "words", n = 2, "src",
      hasher = c => md5(c)).orderBy("grp").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(md5Out.toSeq == Seq((5L, 3L), (3L, 1L)))
  }

  // ---------------------------------------------------------------- Winnowing

  test("Winnowing.select: window min, rightmost tie-break, short input") {
    val df = Seq(Tuple1(Seq(5L, 3L, 3L, 7L, 2L, 9L))).toDF("g")
    val fps = df.select(Winnowing.select(col("g"), 3).as("f"))
      .collect().head.getSeq[Row](0)
      .map(r => (r.getInt(0), r.getLong(1))).sorted
    // [5,3,3]->pos2 (tie goes right), [3,3,7]->pos2, [3,7,2]->pos4, [7,2,9]->pos4
    assert(fps == Seq((2, 3L), (4, 2L)))
    val short = Seq(Tuple1(Seq(8L, 1L))).toDF("g")
      .select(Winnowing.select(col("g"), 3).as("f"))
      .collect().head.getSeq[Row](0).map(r => (r.getInt(0), r.getLong(1)))
    assert(short == Seq((1, 1L)))
  }

  test("Winnowing: shared run of w+k-1 words guarantees a shared hash; gaps <= w") {
    val k = 3; val w = 4
    val common = "alpha beta gamma delta epsilon zeta".split(" ").toSeq // w+k-1 = 6
    val a = Seq("one", "two", "three") ++ common ++ Seq("four", "five")
    val b = Seq("six", "seven") ++ common ++ Seq("eight", "nine", "ten", "eleven")
    val df = Seq((1L, a), (2L, b)).toDF("id", "words")
      .select(col("id"), Winnowing.fingerprints(col("words"), k, w).as("f"))
    val byId = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Row](1).map(x => (x.getInt(0), x.getLong(1)))).toMap
    val hashesA = byId(1L).map(_._2).toSet
    val hashesB = byId(2L).map(_._2).toSet
    assert((hashesA intersect hashesB).nonEmpty,
      "a shared substring of w+k-1 words must share a fingerprint")
    // density guarantee: consecutive selected positions at most w apart
    for ((_, fps) <- byId) {
      val pos = fps.map(_._1).sorted
      assert(pos.head <= w - 1)
      pos.sliding(2).foreach {
        case scala.collection.Seq(p1, p2) => assert(p2 - p1 <= w, s"gap $p1->$p2")
        case _ =>
      }
    }
  }
}

class StupidBackoffSpec extends SparkSpec {
  import graft.operators.StupidBackoff
  import spark.implicits._

  // reference: tokens a,b,c,b,c,d -> N=6; c1 a=1 b=2 c=2 d=1;
  // c2 "a b"=1 "b c"=2 "c d"=1; c3 "a b c"=1 "b c d"=1
  private lazy val ref = Seq(Seq("a", "b", "c"), Seq("b", "c", "d"))
    .toDF("words")

  private def scored(docs: Seq[(Long, Seq[String])]): Map[Long, (Long, Long)] =
    StupidBackoff.score(docs.toDF("id", "words"), "id", "words", ref, "words")
      .select("id", "n_trigrams", "sb_score")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("all three backoff branches score their hand-computed values") {
    val got = scored(Seq(
      (1L, Seq("a", "b", "c", "d", "e")), // trigram hits + dead unigram
      (2L, Seq("x", "b", "c", "y")),      // bigram backoff + dead unigram
      (3L, Seq("x", "y", "d")),           // unigram backoff
      (4L, Seq("q", "d"))))               // <3 words
    // (a,b,c): 1e6*1/1; (b,c,d): 1e6*1/2; (c,d,e): unseen w3=e -> 0
    assert(got(1L) == (3L, 1000000L + 500000L))
    // (x,b,c): 0.4 * c2("b c")/c1(b) = 2/5*1e6*2/2; (b,c,y): 0
    assert(got(2L) == (2L, 400000L))
    // (x,y,d): 0.16 * c1(d)/N = floor(4e6*1/(25*6))
    assert(got(3L) == (1L, 26666L))
    assert(got(4L) == (0L, 0L))
  }

  test("conditional scoring outranks familiarity on gram-order violations") {
    // same word multiset, scrambled order: familiarity can't tell them
    // apart at the unigram level, Stupid Backoff collapses to the
    // 0.4^2 unigram floor on every position
    val fluent = scored(Seq((1L, Seq("a", "b", "c", "d"))))(1L)._2
    val scrambled = scored(Seq((1L, Seq("d", "a", "c", "b"))))(1L)._2
    assert(fluent > 10 * scrambled, s"$fluent vs $scrambled")
  }
}

class PackBoundariesSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.PackSequences

  test("seq_lens partition each chunk by document, straddlers split") {
    // docs: a=5 toks, b=4, c=3 -> stream of 12, chunkSize 4:
    // chunk0 = a a a a            -> [4]
    // chunk1 = a b b b            -> [1, 3]
    // chunk2 = b c c c            -> [1, 3]
    val df = Seq(
      (1L, Seq(10L, 11L, 12L, 13L, 14L)),
      (2L, Seq(20L, 21L, 22L, 23L)),
      (3L, Seq(30L, 31L, 32L))
    ).toDF("doc_id", "ids")
    val got = PackSequences
      .packChunksWithBoundaries(df, "doc_id", "ids", chunkSize = 4,
        bucketSpan = 8)
      .orderBy("chunk")
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    assert(got == Seq(
      (0L, Seq(10L, 11L, 12L, 13L), Seq(4L)),
      (1L, Seq(14L, 20L, 21L, 22L), Seq(1L, 3L)),
      (2L, Seq(23L, 30L, 31L, 32L), Seq(1L, 3L))))
    // invariant: sum(seq_lens) == chunk length, everywhere
    got.foreach { case (_, toks, lens) => assert(lens.sum == toks.size) }
  }

  test("tokens identical to packChunks; dropLast trims the short tail") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L)), (3L, Seq(6L, 7L, 8L, 9L))
    ).toDF("doc_id", "ids")
    val plain = PackSequences
      .packChunks(df, "doc_id", "ids", 4, 8).orderBy("chunk")
      .as[(Long, Seq[Long])].collect().toSeq
    val withB = PackSequences
      .packChunksWithBoundaries(df, "doc_id", "ids", 4, 8).orderBy("chunk")
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    assert(plain == withB.map(t => (t._1, t._2)))
    val trimmed = PackSequences
      .packChunksWithBoundaries(df, "doc_id", "ids", 4, 8, dropLast = true)
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    assert(trimmed.forall(_._2.size == 4))
  }
}

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Readability, ReadabilityScore}

  test("syllables: vowel-group heuristic with silent-e and floor-at-1") {
    val got = Seq("cat", "hello", "code", "idea", "rhythm", "strengths", "zzz")
      .toDF("w").select(Readability.syllables(col("w")).as("s"))
      .as[Int].collect().toSeq
    //           cat hello code idea rhythm strengths zzz(no vowels)
    assert(got == Seq(1, 2, 1, 2, 1, 1, 0))
  }

  test("Flesch formulas: integer fixed-point over the common denominator") {
    val got = ReadabilityScore("text", "words")(
      Seq(("The cat sat.", Seq("The", "cat", "sat.")))
        .toDF("text", "words"))
      .select("n_words", "n_sentences", "n_syllables",
        "fk_grade_centi", "fre_milli")
      .as[(Long, Long, Long, Long, Long)].head()
    // W=3 S=1 Syl=3: FK = floor((39*9+1180*3)/3)-1559 = 1297-1559
    assert(got == ((3L, 1L, 3L, -262L, 119190L)))
  }

  test("no words -> null scores, zero syllables; no sentences floors at 1") {
    val r = ReadabilityScore("text", "words")(
      Seq(("", Seq.empty[String])).toDF("text", "words"))
      .select("n_sentences", "n_syllables", "fk_grade_centi")
      .collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L && r.isNullAt(2))
  }
}

class ShardNoveltySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.CorpusStats

  test("novelty = fraction of distinct grams first seen in this shard") {
    val df = Seq(
      (0L, Seq("a", "b")),
      (0L, Seq("b")), // duplicate within shard: counted once
      (1L, Seq("b", "c")),
      (2L, Seq("a", "c"))
    ).toDF("shard", "grams")
    val got = CorpusStats.shardNovelty(df, "shard", "grams")
      .orderBy("shard")
      .select("shard", "n_grams", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1000000L),
      (1L, 2L, 1L, 500000L),
      (2L, 2L, 0L, 0L)))
  }
}

class TfIdfSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.CorpusStats

  test("linear-idf top terms: corpus-wide terms sink, unique terms rise") {
    val df = Seq(
      (1L, Seq("the", "the", "cat", "sat")),
      (2L, Seq("the", "dog", "sat")),
      (3L, Seq("the", "bird"))
    ).toDF("doc_id", "words")
    val got = CorpusStats.tfIdfTopTerms(df, "doc_id", "words", 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "score_ppm", "rank")
      .as[(Long, String, Long, Long)].collect().toSeq
    // doc1: cat (1*3/1=3e6) beats the (2*3/3=2e6) beats sat (1*3/2=1.5e6)
    assert(got.filter(_._1 == 1L).map(_._2) == Seq("cat", "the"))
    assert(got.filter(_._1 == 1L).map(_._3) == Seq(3000000L, 2000000L))
    // doc3: bird (unique) outranks the (everywhere)
    assert(got.filter(_._1 == 3L).map(_._2) == Seq("bird", "the"))
  }

  test("plan: doc-partitioned window, broadcast N, no cartesian blowup") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("b"))).toDF("doc_id", "words")
    val plan = CorpusStats.tfIdfTopTerms(df, "doc_id", "words", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

class QuoteStatsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.QuoteStats
  import org.apache.spark.sql.functions._

  test("counts quotes of >= minWords only; density and longest exact") {
    val t = """He said "this is a long quote here" then "no" and "two words"."""
    val got = QuoteStats.annotate(Seq(t).toDF("text"), "text", minWords = 3)
      .select("n_quotes", "quote_chars", "longest_quote_words")
      .as[(Long, Long, Long)].head()
    // only "this is a long quote here" (6 words, 25 chars) qualifies
    assert(got == ((1L, 25L, 6L)))
    val none = QuoteStats.annotate(Seq("no quotes at all").toDF("text"), "text")
      .select("n_quotes", "quote_char_ppm").as[(Long, Long)].head()
    assert(none == ((0L, 0L)))
  }
}

class OovRateSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.OovRate
  import org.apache.spark.sql.functions._

  test("per-slice token counts and OOV share against a broadcast vocab") {
    val docs = Seq(
      ("s1", Seq("a", "b", "x")),
      ("s1", Seq("a")),
      ("s2", Seq("y", "z"))
    ).toDF("source", "words")
    val vocab = Seq("a", "b").toDF("term")
    val got = OovRate.perSlice(docs, "source", "words", vocab)
      .orderBy("slice")
      .select("slice", "n_tokens", "n_oov", "oov_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 4L, 1L, 250000L), ("s2", 2L, 2L, 1000000L)))
  }
}

class NeymanAllocationSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.NeymanAllocation
  import org.apache.spark.sql.functions._

  test("allocation proportional to N_h*S_h, sums exactly to budget") {
    // s1: high-variance values; s2: same size, low variance; s3: constant
    val df = Seq(
      ("s1", 0.0), ("s1", 10.0), ("s1", 0.0), ("s1", 10.0),
      ("s2", 5.0), ("s2", 5.2), ("s2", 5.0), ("s2", 5.2),
      ("s3", 7.0), ("s3", 7.0), ("s3", 7.0), ("s3", 7.0)
    ).toDF("stratum", "v")
    val got = NeymanAllocation.plan(df, "stratum", "v", budget = 100)
      .orderBy("stratum")
      .select("stratum", "n_rows", "n_alloc")
      .as[(String, Long, Long)].collect().toSeq
    val byS = got.map(r => r._1 -> r._3).toMap
    assert(got.map(_._3).sum == 100L, got.toString)
    // variance ratio is (5)^2 vs (0.1)^2 -> s1 takes ~98% of the budget
    assert(byS("s1") > 90L && byS("s3") == 0L, byS.toString)
    assert(byS("s1") + byS("s2") + byS("s3") == 100L)
  }

  test("deterministic under repartition; zero-variance corpus -> leftovers by stratum order") {
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0)).toDF("stratum", "v")
    val got = NeymanAllocation.plan(flat, "stratum", "v", budget = 5)
      .orderBy("stratum").select("stratum", "n_alloc")
      .as[(String, Long)].collect().toSeq
    // W = 0 -> proportional fallback: weights (2,1), base (3,1), the
    // leftover goes to b (larger remainder 2 vs 1)
    assert(got == Seq(("a", 3L), ("b", 2L)))
    val re = NeymanAllocation.plan(flat.repartition(5), "stratum", "v", 5)
      .orderBy("stratum").select("stratum", "n_alloc")
      .as[(String, Long)].collect().toSeq
    assert(re == got)
  }
}

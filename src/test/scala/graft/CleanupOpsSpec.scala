package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** C4 cleanup rules, blocklist filtering, BM25 scoring, per-stratum
  * quota sampling, and normalization-robust dedup keys. */
class CleanupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("C4LineFilter: line rules + document gates") {
    val good = Seq(
      "this line ends with a period.",
      "so does this other fine line!",
      "and a third one over here?").mkString("\n")
    val df = Seq(
      (1L, good),
      (2L, good + "\nno punctuation here either way"),   // bad line dropped, doc still passes
      (3L, good + "\nenable javascript to proceed."),    // js line dropped
      (4L, "two lines only end well.\nstill fine here!"),// < minLines → fail
      (5L, good + "\nlorem ipsum dolor sit amet."),      // lorem → fail
      (6L, good + "\nfunction f() { return 1; }")        // brace → fail
    ).toDF("doc_id", "text")
    val out = C4LineFilter("text", "clean")(df)
      .select($"doc_id", $"clean", $"c4_kept_lines", $"c4_pass")
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == good && out(1L)._3 == 3L && out(1L)._4)
    assert(out(2L)._2 == good && out(2L)._4)             // bad line stripped
    assert(out(3L)._2 == good && out(3L)._4)             // js line stripped
    assert(out(4L)._3 == 2L && !out(4L)._4)
    assert(!out(5L)._4 && !out(6L)._4)
    // keepOnly drops failing docs
    assert(C4LineFilter("text", "clean", keepOnly = true)(df).count() == 3L)
  }

  test("BlocklistFilter: case-folded overlap + sorted audit hits") {
    val df = Seq(
      (1L, Seq("Clean", "words", "only")),
      (2L, Seq("some", "BAD", "and", "worse", "words")),
      (3L, Seq.empty[String])
    ).toDF("doc_id", "words")
    val out = BlocklistFilter(Seq("bad", "worse", "absent"))(df)
      .select($"doc_id", $"blocklist_hit", $"blocklist_hits")
      .as[(Long, Boolean, Seq[String])].collect().map(r => r._1 -> r).toMap
    assert(!out(1L)._2 && out(1L)._3.isEmpty)
    assert(out(2L)._2 && out(2L)._3 == Seq("bad", "worse"))
    assert(!out(3L)._2)
    // case-sensitive mode misses the uppercased word
    val cs = BlocklistFilter(Seq("bad"), caseFold = false)(df)
      .filter($"blocklist_hit").count()
    assert(cs == 0L)
    assert(BlocklistFilter(Seq("bad"), keepOnly = true)(df).count() == 2L)
  }

  test("Bm25: stats literals + integer score replicated on the JVM") {
    val df = Seq(
      (1L, Seq("spark", "spark", "fast")),
      (2L, Seq("slow", "db")),
      (3L, Seq("spark", "db", "db", "extra"))
    ).toDF("doc_id", "words")
    val st = Bm25.stats(df, "words", Seq("spark", "db"))
    assert(st.nDocs == 3L && st.avgDl == 3L) // (3+2+4)/3 = 3
    // df(spark)=2, df(db)=2 → idf = (3-2+1)*1e6/(2+1)
    assert(st.idf("spark") == 2000000L / 3L && st.idf("db") == 2000000L / 3L)
    val scores = df.select($"doc_id", Bm25.score($"words", st).as("s"))
      .as[(Long, Long)].collect().toMap
    def term(idf: Long, tf: Long, dl: Long): Long = {
      val avg = st.avgDl
      (idf * tf * 2200L * avg) / (1000L * tf * avg + 300L * avg + 900L * dl)
    }
    val idf = 2000000L / 3L
    assert(scores(1L) == term(idf, 2, 3))             // spark ×2
    assert(scores(2L) == term(idf, 1, 2))             // db ×1
    assert(scores(3L) == term(idf, 1, 4) + term(idf, 2, 4))
  }

  test("takePerStratum: exact quota, deterministic, repartition-stable") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "s")
    val a = Sampling.takePerStratum(df, "id", "s", k = 5)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a.length == 10)
    val b = Sampling.takePerStratum(df.repartition(7), "id", "s", k = 5)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // quota larger than a stratum returns the whole stratum
    val c = Sampling.takePerStratum(df, "id", "s", k = 40)
    assert(c.filter($"s" === "a").count() == 33L)
    assert(c.filter($"s" === "b").count() == 40L)
  }

  test("takePerStratum composes with same-salt keep-thinning (doc claim)") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "s")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").as[Long].collect().toSet
    // production leg: rank key IS keep's retained measure
    val full = ids(Sampling.takePerStratum(df, "id", "s", k = 8, salt = "c1"))
    val thin = df.filter(Sampling.keep(col("id"), 0.5, salt = "c1"))
    assert(thin.groupBy("s").count().as[(String, Long)].collect()
      .forall(_._2 >= 8)) // precondition of the claim
    val composed = ids(Sampling.takePerStratum(thin, "id", "s", k = 8, salt = "c1"))
    assert(composed == full)
    // portable leg: md5 rank prefix-consistent with keepMd5 thresholds
    val fullP = ids(Sampling.takePerStratum(df, "id", "s", k = 8,
      salt = "c1", portable = true))
    val thinP = df.filter(Sampling.keepMd5(col("id"), 0.5, salt = "c1"))
    val composedP = ids(Sampling.takePerStratum(thinP, "id", "s", k = 8,
      salt = "c1", portable = true))
    assert(composedP == fullP)
  }

  test("temperature: anchor kept whole, alpha=1 identity, exact JVM replica") {
    val df = ((1L to 300L).map(i => (i, "big")) ++
      (301L to 400L).map(i => (i, "mid")) ++
      (401L to 425L).map(i => (i, "small"))).toDF("id", "src")
    // alpha = 1 → rate 1 for every source (w ∝ n cancels exactly)
    assert(Sampling.temperature(df, "id", "src", alpha = 1.0).count() == 425L)
    val out = Sampling.temperature(df, "id", "src", alpha = 0.5,
      salt = "t", portable = true)
    val byA = out.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // the smallest source is the anchor: kept in full
    assert(byA("small") == 25L)
    // flattening: kept share of big < kept share of mid < 1
    assert(byA("big").toDouble / 300 < byA("mid").toDouble / 100)
    // exact replica: recompute every keep decision on the JVM
    def wOf(n: Long) = BigInt((1e6 * math.sqrt(n.toDouble)).toLong)
    val ns = Map("big" -> 300L, "mid" -> 100L, "small" -> 25L)
    val (nStar, wStar) = (25L, wOf(25L))
    val expected = ((1L to 300L).map((_, "big")) ++ (301L to 400L).map((_, "mid")) ++
      (401L to 425L).map((_, "small"))).filter { case (id, s) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}t".getBytes("UTF-8")).take(3)
        .map("%02x".format(_)).mkString
      val a = BigInt(hex, 16)
      a * wStar * ns(s) < BigInt(16777216L) * wOf(ns(s)) * nStar
    }.map(_._1).toSet
    assert(out.select("id").as[Long].collect().toSet == expected)
    // stable under repartitioning
    val out2 = Sampling.temperature(df.repartition(7), "id", "src",
      alpha = 0.5, salt = "t", portable = true)
    assert(out2.select("id").as[Long].collect().toSet == expected)
  }

  test("TextChunker: greedy char budget, oversized unit, empty text") {
    val df = Seq(
      (1L, "aaaa bb cc ddddd e"), // lens 4,2,2,5,1 — budget 8: [aaaa bb cc][ddddd e]
      (2L, "x".repeat(20)),       // single oversized unit → its own chunk
      (3L, "")                    // no units → no rows
    ).toDF("doc_id", "text")
    val out = TextChunker("text", "chunk", maxChars = 8L)(df)
      .select($"doc_id", $"chunk_idx", $"chunk")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 0L, "aaaa bb cc"), // 4+2+2=8 fits; +5 would break the budget
      (1L, 1L, "ddddd e"),
      (2L, 0L, "x".repeat(20))
    ))
    // maxUnits caps pack size even under budget
    val byUnits = TextChunker("text", "chunk", maxChars = 100L, maxUnits = 2L)(
      df.filter($"doc_id" === 1L)).count()
    assert(byUnits == 3L) // 5 units / 2 per chunk → 3 chunks
  }

  test("GroupQualityGate: integer group means gate whole groups") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 11L),  // mean 10.5 → 10500000
      (3L, "b", 3L), (4L, "b", 4L)     // mean 3.5  → 3500000
    ).toDF("id", "grp", "score")
    val out = GroupQualityGate("grp", "score", minMeanScaled = 10000000L)(df)
      .select($"id", $"grp_mean_scaled", $"group_pass")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 10500000L && out(1L)._3)
    assert(out(3L)._2 == 3500000L && !out(3L)._3)
    val kept = GroupQualityGate("grp", "score", 10000000L, keepOnly = true)(df)
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("Pseudonymize: deterministic, null-preserving, join-stable") {
    val df = Seq((1L, Some("alice")), (2L, Some("bob")), (3L, None))
      .toDF("id", "user")
    val out = Pseudonymize(Seq("user"), salt = "s1")(df)
      .select($"id", $"user").as[(Long, Option[String])].collect().toMap
    val jvm = (v: String) => java.security.MessageDigest.getInstance("SHA-256")
      .digest(("s1" + v).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L).contains(jvm("alice")) && out(2L).contains(jvm("bob")))
    assert(out(3L).isEmpty)                        // null stays null
    assert(out(1L).get.length == 64)
    // a different salt yields unlinkable tokens
    val out2 = Pseudonymize(Seq("user"), salt = "s2")(df)
      .select($"user").as[Option[String]].collect().flatten.toSet
    assert(out2.intersect(Set(out(1L).get, out(2L).get)).isEmpty)
  }

  test("leakage-aware split keeps dup-group members in one split") {
    val base = Seq((1L, "Some Text Here!"), (2L, "other content.")).toDF("doc_id", "text")
    val noisy = base.select(($"doc_id" + 100L).as("doc_id"),
      upper($"text").as("text"))
    val out = NormalizeForDedup("text", "dedup_key")(base.unionByName(noisy))
      .select($"doc_id",
        Sampling.splitLabelMd5($"dedup_key",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "leak").as("split"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == out(101L) && out(2L) == out(102L))
  }

  test("paddingWaste: exact batch stats; sorted layout never costs more") {
    val df = Seq((1L, 10L), (2L, 2L), (3L, 9L), (4L, 1L))
      .toDF("id", "len")
    // sorted by len: [1,2], [9,10] → padding (2*2-3)=1 + (2*10-19)=1
    val sorted = CollatorStats.paddingWaste(df, "id", "len", 2)
      .orderBy("batch").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(sorted == Seq((0L, 2L, 2L, 3L, 1L), (1L, 2L, 10L, 19L, 1L)))
    // arrival order: [10,2], [9,1] → padding 8 + 8
    val arrival = CollatorStats.paddingWaste(df, "id", "len", 2,
      sortByLength = false)
      .agg(sum($"padding")).as[Long].head()
    assert(arrival == 16L)
    // random lengths: sorted total never exceeds arrival total
    val rnd = new scala.util.Random(7)
    val big = (1L to 200L).map(i => (i, rnd.nextInt(100).toLong + 1))
      .toDF("id", "len")
    def tot(sorted: Boolean) =
      CollatorStats.paddingWaste(big, "id", "len", 16, sorted)
        .agg(sum($"padding")).as[Long].head()
    assert(tot(true) <= tot(false))
  }

  test("NormalizeForDedup: case/punct/ws-insensitive keys collide") {
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "  hello world  "),
      (3L, "héllo wörld"),        // accents survive → different key
      (4L, "hello\tworld\n")
    ).toDF("doc_id", "text")
    val keys = NormalizeForDedup()(df)
      .select($"doc_id", $"dedup_key").as[(Long, String)].collect().toMap
    assert(keys(1L) == "hello world")
    assert(keys(1L) == keys(2L) && keys(2L) == keys(4L))
    assert(keys(3L) == "héllo wörld" && keys(3L) != keys(1L))
    val survivors = ExactDedup("dedup_key", "doc_id")(NormalizeForDedup()(df))
    assert(survivors.count() == 2L)
    assert(survivors.select(min($"doc_id")).as[Long].head() == 1L)
  }

  test("CdcChunker: lossless, content-defined, edit re-synchronizes") {
    import graft.operators.CdcChunker
    val rnd = new scala.util.Random(5)
    val text = (0 until 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def chunksOf(t: String): Seq[String] = {
      val df = Seq((1L, t)).toDF("doc_id", "text")
      CdcChunker()(df).orderBy("chunk_idx")
        .select("chunk").as[String].collect().toSeq
    }
    val base = chunksOf(text)
    // lossless split, sane geometric lengths around the divisor
    assert(base.mkString == text)
    assert(base.size > 2, s"expected several chunks, got ${base.size}")
    // an edit at the FRONT only disturbs the leading chunk(s): later
    // boundaries depend on local content and re-synchronize
    val edited = chunksOf("Z" + text)
    assert(edited.mkString == "Z" + text)
    val shared = base.toSet.intersect(edited.toSet)
    assert(shared.size >= base.size - 2,
      s"CDC should re-sync: ${base.size} vs shared ${shared.size}")
    // offset-based chunking (fixed 64-char cuts) would share ~nothing;
    // sanity-check that claim on the same pair
    val fixedA = text.grouped(64).toSeq
    val fixedB = ("Z" + text).grouped(64).toSeq
    assert(fixedA.toSet.intersect(fixedB.toSet).isEmpty)
    // short text: single chunk, index 0
    assert(chunksOf("tiny") == Seq("tiny"))
    // empty text: no rows
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    assert(CdcChunker()(empty).count() == 0L)
  }

  test("ChunkDupStats: edited copy shares most chunks; unique doc shares none") {
    import graft.operators.{CdcChunker, ChunkDupStats}
    val rnd = new scala.util.Random(9)
    def txt() = (0 until 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val a = txt()
    val df = Seq((1L, a), (2L, "Z" + a), (3L, txt())).toDF("doc_id", "text")
    val stats = ChunkDupStats.perDoc(CdcChunker()(df), "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the near-copy pair shares most chunks; the unrelated doc none
    assert(stats(0)._3 > 500000L, s"doc1 dup_pct ${stats(0)._3}")
    assert(stats(1)._3 > 500000L, s"doc2 dup_pct ${stats(1)._3}")
    assert(stats(2)._3 == 0L, s"doc3 dup_pct ${stats(2)._3}")
  }

  test("takeWeighted (A-ES): exact k, repartition-stable, weight-sensitive") {
    val df = (1L to 200L).map(i => (i, i)).toDF("id", "w") // weight = id
    val a = Sampling.takeWeighted(df, "id", col("w"), k = 30)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a.length == 30)
    val b = Sampling.takeWeighted(df.repartition(7), "id", col("w"), k = 30)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b) // no RNG state, order-independent
    // expected inclusion probability of row i is ∝ w_i for the TOP slot
    // and increasing in w overall: heavy rows dominate the sample
    assert(a.count(_ > 100L) > a.count(_ <= 100L),
      s"heavy half underrepresented: $a")
    // a practically-infinite weight is always selected
    val spiked = df.withColumn("w",
      when($"id" === 7L, lit(1e12)).otherwise($"w".cast("double")))
    val s = Sampling.takeWeighted(spiked, "id", col("w"), k = 5)
      .select($"id").as[Long].collect().toSet
    assert(s.contains(7L))
    // non-positive weights are ineligible, k > eligible returns all
    val few = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0), (4L, 2.0)).toDF("id", "w")
    assert(Sampling.takeWeighted(few, "id", col("w"), k = 10)
      .select($"id").as[Long].collect().toSet == Set(1L, 4L))
    // portable md5 leg is a different but equally deterministic sample
    val p1 = Sampling.takeWeighted(df, "id", col("w"), k = 30, portable = true)
      .select($"id").as[Long].collect().sorted.toSeq
    val p2 = Sampling.takeWeighted(df.repartition(3), "id", col("w"), k = 30,
      portable = true).select($"id").as[Long].collect().sorted.toSeq
    assert(p1 == p2)
  }

  test("takeWeightedPerStratum: exact quota per stratum, same key as global") {
    val df = (1L to 120L).map(i => (i, if (i % 2 == 0) "a" else "b", i))
      .toDF("id", "s", "w")
    val out = Sampling.takeWeightedPerStratum(df, "id", "s", col("w"), k = 10)
    assert(out.groupBy("s").count().as[(String, Long)].collect().toMap ==
      Map("a" -> 10L, "b" -> 10L))
    // a one-stratum input reproduces the global top-k (same ordering key)
    val one = df.withColumn("s", lit("x"))
    val viaStratum = Sampling.takeWeightedPerStratum(one, "id", "s", col("w"), 15)
      .select($"id").as[Long].collect().sorted.toSeq
    val global = Sampling.takeWeighted(df, "id", col("w"), 15)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaStratum == global)
  }

  test("MojibakeScore: clean text scores zero; each damage class counts") {
    val dirt = "\u00C3\u00A9\u00C3\u00A8 \u00E2\u20AC\u0153q" +
      "\u00E2\u20AC\u009D \u00C2\u00A0x"
    val df = Seq(
      (1L, "perfectly clean ascii text, no mojibake at all."),
      (2L, dirt),                       // 5 pairs + 1 lone C1
      (3L, "caf\u00E9 na\u00EFve r\u00E9sum\u00E9"), // real accents: no pairs
      (4L, "\u0080\u009F")              // 2 lone C1 controls, no lead
    ).toDF("doc_id", "text")
    val out = MojibakeScoreMapper("text")(df)
      .select($"doc_id", $"mojibake_pairs", $"c1_controls", $"badness_permille")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0, 0, 0L)))
    assert(out(2L)._2 == 5 && out(2L)._3 == 1)
    assert(out(2L)._4 == 1000L * 6 / dirt.length)
    assert(out(3L) == ((3L, 0, 0, 0L)))   // accented text is NOT mojibake
    assert(out(4L)._2 == 0 && out(4L)._3 == 2 && out(4L)._4 == 1000L)
  }

  test("TextToSentences rule mode: terminator runs, no-space splits, tail") {
    val df = Seq(
      (1L, "First sentence. Second one! Really?! trailing fragment"),
      (2L, "a.b"),                       // terminator without space still splits
      (3L, "   only   spaces   "),       // no terminator: one stripped sentence
      (4L, ""),                          // empty: empty array
      (5L, "Ends clean.")
    ).toDF("doc_id", "text")
    val out = TextToSentences(Seq("text"))(df)
      .select($"doc_id", $"text").as[(Long, Seq[String])]
      .collect().map(r => r._1 -> r._2).toMap
    assert(out(1L) == Seq("First sentence.", "Second one!", "Really?!",
      "trailing fragment"))
    assert(out(2L) == Seq("a.", "b"))
    assert(out(3L) == Seq("only   spaces"))
    assert(out(4L) == Seq.empty)
    assert(out(5L) == Seq("Ends clean."))
  }

  test("TextToSentences break_iterator mode: UAX #29 boundaries") {
    val df = Seq((1L, "Hello world. Second sentence! Third?"))
      .toDF("doc_id", "text")
    val out = TextToSentences(Seq("text"), SentenceSplitters.BreakIter)(df)
      .select($"text").as[Seq[String]].collect().head
    assert(out == Seq("Hello world.", "Second sentence!", "Third?"))
  }

  test("ScriptProfile: per-mille composition and dominant tie-break") {
    val df = Seq(
      (1L, "hello world"),                    // pure latin
      (2L, "\u043f\u0440\u0438\u0432\u0435\u0442 hello"),  // cyrillic 6 vs latin 5
      (3L, "\u4f60\u597d\u3053\u3093"),   // pure cjk (han + kana)
      (4L, "12345"),                          // digits only
      (5L, "ab \u0430\u0431"),              // latin 2 = cyrillic 2: first-maximal wins
      (6L, "   "),                            // nothing: denominator clamps, dominant other
      (7L, "\u03b3\u03b5\u03b9\u03ac \u0645\u0631\u062d")  // greek 4 vs arabic 3
    ).toDF("doc_id", "text")
    val out = ScriptProfileMapper("text")(df)
      .select($"doc_id", $"latin_pm", $"cyrillic_pm", $"dominant")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1000L, 0L, "latin")))
    assert(out(2L)._4 == "cyrillic" && out(2L)._2 == 1000L * 5 / 11)
    assert(out(3L)._4 == "cjk")
    assert(out(4L)._4 == "digit")
    assert(out(5L)._4 == "latin")   // classes order is the tie-break
    assert(out(6L) == ((6L, 0L, 0L, "other")))
    assert(out(7L)._4 == "greek")
  }

  test("DeletePropagation: consistent purge + audit across derived tables") {
    val corpus = Seq(
      (1L, "keep one"), (2L, "drop two"), (3L, "keep three"),
      (4L, "drop four"), (5L, "keep five")).toDF("doc_id", "text")
    val derived = corpus.select($"doc_id", length($"text").as("n"))
    val deletes = Seq(2L, 4L, 99L).toDF("del_id") // 99 hits nothing
    val purged = DeletePropagation.purge(corpus, "doc_id", deletes, "del_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(purged == Seq(1L, 3L, 5L))
    val ck: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column =
      _ => $"doc_id" * 10L
    val audit = DeletePropagation.audit(
      Seq("corpus" -> corpus, "derived" -> derived),
      "doc_id", deletes, "del_id", ck)
      .orderBy("table")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(audit == Seq(
      ("corpus", 5L, 2L, 3L, 90L),   // survivors 1,3,5 -> 10+30+50
      ("derived", 5L, 2L, 3L, 90L)))
    // duplicate requests don't double-count deletions
    val dup = deletes.union(deletes)
    val a2 = DeletePropagation.audit(Seq("corpus" -> corpus),
      "doc_id", dup, "del_id", ck).collect().head
    assert(a2.getLong(2) == 2L && a2.getLong(3) == 3L)
  }

  test("RendezvousShard: minimal disruption, order-insensitive, balanced-ish") {
    val shards = Seq("s0", "s1", "s2", "s3")
    val keys = spark.range(0, 2000).toDF("k")
    val both = keys.select($"k",
      RendezvousShard.assign($"k", shards).as("a4"),
      RendezvousShard.assign($"k", shards.take(3)).as("a3"),
      RendezvousShard.assign($"k", shards.reverse).as("a4r"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // shard-list order never matters
    both.foreach { case (k, a4, _, a4r) => assert(a4 == a4r, s"key $k") }
    // removing s3 moves EXACTLY s3's keys, each to a surviving shard
    both.foreach { case (k, a4, a3, _) =>
      if (a4 == "s3") assert(a3 != "s3", s"key $k kept a removed shard")
      else assert(a3 == a4, s"key $k moved without cause: $a4 -> $a3")
    }
    // each shard holds a plausible share (expected 500 of 2000)
    val byShard = both.groupBy(_._2).view.mapValues(_.length).toMap
    shards.foreach { sh =>
      val c = byShard.getOrElse(sh, 0)
      assert(c > 300 && c < 700, s"$sh holds $c of 2000")
    }
  }
}

class TextRepairSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TextRepair

  private def fix(t: String): String =
    Seq(t).toDF("t").select(TextRepair.repair(col("t")).as("r"))
      .as[String].head()

  test("de-hyphenates split words before unwrapping") {
    assert(fix("an exam-\nple here") == "an example here")
    assert(fix("co-\n  operate") == "cooperate")
    // a hyphen NOT followed by a newline+letter is left alone
    assert(fix("state-of-the-art") == "state-of-the-art")
    // digit-hyphen-newline is not a split word
    assert(fix("sum is 5-\n6 range") == "sum is 5- 6 range")
  }

  test("single newlines become spaces, paragraph breaks survive") {
    assert(fix("line one\nline two\n\npara two\nstill") ==
      "line one line two\n\npara two still")
  }

  test("3+ newline runs normalize to one blank line first") {
    assert(fix("a\n\n\n\nb") == "a\n\nb")
  }
}

class CohenKappaSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Agreement

  test("perfect agreement is 1e6; independent-looking raters drop toward 0") {
    val perfect = Agreement.cohenKappa(
      Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2"), "r1", "r2")
      .select("kappa_ppm").as[Long].head()
    assert(perfect == 1000000L)
    // classic textbook example: n=50, agree=35, marginals a:(25,25) b:(30,20)
    // pe_num = 25*30+25*20 = 1250; kappa = (50*35-1250)/(2500-1250) = 0.4
    val rows = (1 to 20).map(_ => ("y", "y")) ++ (1 to 15).map(_ => ("n", "n")) ++
      (1 to 10).map(_ => ("y", "n")) ++ (1 to 5).map(_ => ("n", "y"))
    val got = Agreement.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .select("n", "agree", "pe_num", "kappa_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((50L, 35L, 1250L, 400000L)))
  }

  test("all-one-label degenerate case yields null (pe = 1)") {
    val got = Agreement.cohenKappa(
      Seq(("a", "a"), ("a", "a")).toDF("r1", "r2"), "r1", "r2")
      .select("kappa_ppm").collect().head
    assert(got.isNullAt(0))
  }

  test("systematic disagreement goes negative with exact floor") {
    val got = Agreement.cohenKappa(
      Seq(("a", "b"), ("b", "a"), ("a", "b")).toDF("r1", "r2"), "r1", "r2")
      .select("kappa_ppm").as[Long].head()
    // n=3 agree=0; ma a:2,b:1; mb b:2,a:1; pe_num = 2*1? a:2*1=2? a count_a=2,count_b=1 ->2; b:1*2=2; pe=4
    // kappa = (0-4)/(9-4) = -0.8 -> floor(-800000)
    assert(got == -800000L)
  }
}

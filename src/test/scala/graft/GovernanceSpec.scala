package graft

import org.apache.spark.sql.functions._
import graft.operators.{PrivacyAudit, SuppressQuasiIdentifiers}

class PrivacyAuditSpec extends SparkSpec {
  import spark.implicits._

  // QI = (zip, age); sensitive = diagnosis.
  // Class (10001, 30): 3 rows, 3 distinct diagnoses  -> k=3,l=3 ok
  // Class (10001, 40): 2 rows, 1 distinct diagnosis  -> k fails at 3, l fails at 2
  // Class (10002, 30): 3 rows, 1 distinct diagnosis  -> k ok, l fails at 2
  private def data =
    Seq(
      ("10001", 30, "a"), ("10001", 30, "b"), ("10001", 30, "c"),
      ("10001", 40, "a"), ("10001", 40, "a"),
      ("10002", 30, "b"), ("10002", 30, "b"), ("10002", 30, "b")
    ).toDF("zip", "age", "diag")

  test("audit computes class sizes, distinct sensitive counts, flags") {
    val got = rows(
      PrivacyAudit.audit(data, Seq("zip", "age"), "diag", 3, 2)
        .orderBy("zip", "age"))
    assert(got == Seq(
      Seq("10001", 30, 3L, 3L, true, true),
      Seq("10001", 40, 2L, 1L, false, false),
      Seq("10002", 30, 3L, 1L, true, false)))
  }

  test("gate summarizes violating classes and rows") {
    val got = rows(PrivacyAudit.gate(data, Seq("zip", "age"), "diag", 3, 2))
    assert(got == Seq(Seq(3L, 2L, 5L)))
  }

  test("suppress nulls QI columns of exactly the violating classes") {
    val out = PrivacyAudit
      .suppress(data, Seq("zip", "age"), "diag", 3, 2)
      .orderBy(col("diag"), col("zip").asc_nulls_last)
    assert(out.columns.toSeq == Seq("zip", "age", "diag"))
    val got = rows(out)
    // (10001,40) and (10002,30) classes suppressed; (10001,30) intact
    assert(got.count(r => r(0) == null && r(1) == null) == 5)
    assert(got.filter(_(2) == "c") == Seq(Seq("10001", 30, "c")))
  }

  test("mapper wrapper runs suppression") {
    val out = SuppressQuasiIdentifiers(Seq("zip", "age"), "diag", k = 3, l = 2)(data)
    assert(out.filter(col("zip").isNull).count() == 5)
  }

  test("suppression treats null QI values as a class of their own") {
    val d = Seq((Option.empty[String], "x"), (None, "y"), (Some("z"), "x"))
      .toDF("zip", "diag")
    // null-zip class has 2 rows -> passes k=2; ("z") class fails
    val out = PrivacyAudit.suppress(d, Seq("zip"), "diag", 2, 1)
    assert(out.filter(col("diag") === "x" && col("zip").isNull).count() == 2)
  }
}

class CorpusHealthSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.CorpusHealth

  private def run(rows: Seq[(Long, Seq[String])]) =
    CorpusHealth.zipfHeaps(rows.toDF("doc_id", "words"), "doc_id", "words")
      .collect()(0)

  test("ilog2 matches length(bin(x)) - 1") {
    val got = Seq(1L, 2L, 3L, 4L, 1023L, 1024L).toDF("x")
      .select(CorpusHealth.ilog2(col("x"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 9L, 10L))
  }

  test("uniform term counts give zero zipf slope") {
    // every term appears exactly twice -> y constant -> slope 0
    val r = run(Seq((0L, Seq("a", "b", "c", "d")), (1L, Seq("a", "b", "c", "d"))))
    assert(r.getAs[Long]("zipf_neg_slope_milli") == 0L)
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(r.getAs[Long]("n_tokens") == 8L)
  }

  test("skewed counts give a steeper zipf slope than mild ones") {
    val skewed = run(Seq((0L, Seq.fill(64)("the") ++ Seq("a", "b", "c", "d"))))
      .getAs[Long]("zipf_neg_slope_milli")
    val mild = run(Seq((0L, Seq("the", "the", "a", "b", "c", "d"))))
      .getAs[Long]("zipf_neg_slope_milli")
    assert(skewed > mild && mild >= 0L)
  }

  test("heaps beta: fresh-vocabulary corpus near 1000, repetitive near 0") {
    val fresh = run((0L until 40L).map(i =>
      (i, Seq(s"w${i}a", s"w${i}b", s"w${i}c"))))
      .getAs[Long]("heaps_beta_milli")
    val stale = run((0L until 40L).map(i => (i, Seq("x", "y", "z"))))
      .getAs[Long]("heaps_beta_milli")
    assert(fresh > 900L && fresh <= 1100L, s"fresh=$fresh")
    assert(stale == 0L, s"stale=$stale")
  }
}

class CompactionPlanSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.CompactionPlan

  test("greedy byte-budget bins in file-name order, per group") {
    val m = Seq(
      ("p1", "a", 60L), ("p1", "b", 30L), ("p1", "c", 30L), ("p1", "d", 50L),
      ("p2", "e", 10L)
    ).toDF("part", "file", "bytes")
    val got = rows(
      CompactionPlan.plan(m, "part", "file", "bytes", targetBytes = 100L)
        .orderBy("part", "bin"))
    // p1: a(60)+b(30)=90, +c(30) would be 120 -> break; c(30)+d(50)=80
    assert(got == Seq(
      Seq("p1", 0L, 2L, 90L, List("a", "b")),
      Seq("p1", 1L, 2L, 80L, List("c", "d")),
      Seq("p2", 0L, 1L, 10L, List("e"))))
  }

  test("maxFiles caps a bin even under budget") {
    val m = (1 to 5).map(i => ("p", f"f$i", 1L)).toDF("part", "file", "bytes")
    val got = rows(
      CompactionPlan.plan(m, "part", "file", "bytes", 100L, maxFiles = 2)
        .orderBy("bin"))
    assert(got.map(_(2)) == Seq(2L, 2L, 1L))
  }

  test("an oversized single file gets its own bin, plan covers all files") {
    val m = Seq(("p", "big", 500L), ("p", "tiny", 1L)).toDF("part", "file", "bytes")
    val got = rows(CompactionPlan.plan(m, "part", "file", "bytes", 100L)
      .orderBy("bin"))
    assert(got.map(_(3)) == Seq(500L, 1L))
  }
}

class PerceptronTrainerSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{PerceptronTrainer, QualityClassifier}

  private val dim = 16
  private val idx = (t: org.apache.spark.sql.Column) =>
    QualityClassifier.md5Index(t, dim)

  private val toy = Seq(
    (Seq("good", "fine", "nice"), 1L),
    (Seq("good", "nice"), 1L),
    (Seq("bad", "awful"), -1L),
    (Seq("bad", "awful", "worse"), -1L)
  ).toDF("words", "y")

  test("round 1 from zero weights is the signed token-count sum") {
    val got = PerceptronTrainer
      .trainWeights(toy, "words", "y", dim, rounds = 1, idx)
      .filter(col("weight") =!= 0L).orderBy("j")
    // every doc misclassified at w=0 (y*0 <= 0): weight[j] = sum of y
    // over tokens hashing to j
    val expect = toy.select(col("y"), explode(col("words")).as("t"))
      .groupBy(idx(col("t")).as("j")).agg(sum("y").as("weight"))
      .filter(col("weight") =!= 0L).orderBy("j")
    assert(rows(got) == rows(expect))
  }

  test("trained weights separate a separable toy corpus") {
    val w = PerceptronTrainer
      .train(toy, "words", "y", dim, rounds = 3, idx)
      .collect()(0).getSeq[Long](0)
    val margins = toy.select(
      PerceptronTrainer.margin(col("words"), w, idx).as("m"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(margins.forall { case (m, y) => m * y > 0 },
      s"margins=${margins.toSeq}")
  }

  test("training is deterministic across runs") {
    def go() = PerceptronTrainer
      .trainWeights(toy, "words", "y", dim, 3, idx).orderBy("j")
    assert(rows(go()) == rows(go()))
  }
}

class StopwordInductionSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.StopwordInduction

  test("per-language df ranking with within-doc dedup and ppm scaling") {
    val d = Seq(
      ("en", Seq("the", "the", "cat")),   // "the" counted once per doc
      ("en", Seq("the", "dog")),
      ("en", Seq("a", "dog")),
      ("fr", Seq("le", "chat")),
      ("fr", Seq("le", "chien"))
    ).toDF("lang", "words")
    val got = rows(StopwordInduction.topByDf(d, "lang", "words", 2)
      .orderBy("lang", "rank"))
    // "dog" and "the" tie at df=2; ties break by word ascending
    assert(got == Seq(
      Seq("en", "dog", 2L, 666666L, 1L),
      Seq("en", "the", 2L, 666666L, 2L),
      Seq("fr", "le", 2L, 1000000L, 1L),
      Seq("fr", "chat", 1L, 500000L, 2L)))
  }
}

class TokenizerEvalSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TokenizerEval

  test("fertility and compression per language, integral ratios") {
    val d = Seq(
      ("en", "hello world", Seq("hello", "world")),   // 2 pieces
      ("en", "it's fine", Seq("it's", "fine")),       // it + ' + s + fine = 4
      ("fr", "l'eau", Seq("l'eau"))                   // l + ' + eau = 3
    ).toDF("lang", "text", "words")
    val got = rows(TokenizerEval.fertility(d, "lang", "text", "words")
      .orderBy("lang"))
    assert(got == Seq(
      Seq("en", 2L, 4L, 6L, 20L, 1500000L, 3333L),
      Seq("fr", 1L, 1L, 3L, 5L, 3000000L, 1666L)))
  }
}

class RepetitionRunSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.RepetitionRun

  test("longest immediate-repeat run") {
    val got = Seq(
      Seq.empty[String],
      Seq("a"),
      Seq("a", "b", "c"),
      Seq("a", "a", "a", "b"),
      Seq("x", "b", "b", "c", "c", "c"),
      Seq("z", "z")
    ).toDF("w").select(RepetitionRun.maxRun(col("w")).as("r"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 1L, 3L, 3L, 2L))
  }
}

class RateAnomalySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.RateAnomaly
  import java.sql.Timestamp

  private def t(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")

  test("trailing baseline flags a volume spike, first hour has no baseline") {
    // key "a": hours 0..2 have 2 events each, hour 3 has 12 -> spike
    val rows0 =
      (0 to 2).flatMap(h => Seq.fill(2)(("a", t(h)))) ++
        Seq.fill(12)(("a", t(3))) ++ Seq(("b", t(0)))
    val out = RateAnomaly.hourlySpikes(rows0.toDF("k", "ts"), "k", "ts",
      trailing = 6, spikeRatioMilli = 3000L)
      .orderBy("key", "hour")
    val got = rows(out.select("key", "n", "prev_n", "prev_sum",
      "ratio_milli", "spike"))
    assert(got == Seq(
      Seq("a", 2L, 0L, null, null, false),
      Seq("a", 2L, 1L, 2L, 1000L, false),
      Seq("a", 2L, 2L, 4L, 1000L, false),
      Seq("a", 12L, 3L, 6L, 6000L, true),
      Seq("b", 1L, 0L, null, null, false)))
  }
}

class VocabDriftSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.VocabDrift

  test("rate deltas catch terms drifting in and out") {
    val before = Seq(Seq("a", "a", "b", "c")).toDF("words")  // total 4
    val after = Seq(Seq("a", "b", "b", "b")).toDF("words")   // total 4
    val got = rows(VocabDrift.topChanges(before, after, "words", 10))
    // a: 500000 -> 250000 (-250000); b: 250000 -> 750000 (+500000);
    // c: 250000 -> 0 (-250000). Order: |delta| desc, term asc.
    assert(got == Seq(
      Seq("b", 1L, 3L, 250000L, 750000L, 500000L),
      Seq("a", 2L, 1L, 500000L, 250000L, -250000L),
      Seq("c", 1L, 0L, 250000L, 0L, -250000L)))
  }

  test("minCount drops noise terms") {
    val before = Seq(Seq("x", "y")).toDF("words")
    val after = Seq(Seq("x", "x", "x")).toDF("words")
    val got = rows(VocabDrift.topChanges(before, after, "words", 10, minCount = 3L))
    assert(got.map(_(0)) == Seq("x"))
  }
}

class BurstinessSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Burstiness

  test("cf/df ratio ranks template terms over common ones") {
    val d = Seq(
      (0L, Seq.fill(6)("spamword") ++ Seq("the")),
      (1L, Seq("the", "cat")),
      (2L, Seq("the", "dog"))
    ).toDF("doc_id", "words")
    val got = rows(Burstiness.topBursty(d, "doc_id", "words", 5, minCf = 2L))
    // spamword: cf 6, df 1 -> 6000; the: cf 3, df 3 -> 1000
    assert(got == Seq(
      Seq("spamword", 6L, 1L, 6000L),
      Seq("the", 3L, 3L, 1000L)))
  }
}

class WarcCodecSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.WarcCodec

  test("render/parse round-trips, honoring Content-Length framing on adversarial payloads") {
    // payloads embed BOTH the record marker and the header separator —
    // a split-on-delimiter parser would shred them
    val adversarial = "before\r\n\r\nWARC/1.0\r\nWARC-Record-ID: fake\r\n\r\nafter"
    val d = Seq(
      ("g1", "1", "plain text"),
      ("g1", "2", adversarial),
      ("g2", "3", "")
    ).toDF("g", "id", "p")
    val blobs = WarcCodec.render(d, "g", "id", "p")
    assert(blobs.count() == 2)
    val back = WarcCodec.parse(blobs, "group", "blob")
      .orderBy("group", "rid")
    val got = rows(back)
    assert(got == Seq(
      Seq("g1", "1", 10L, "plain text"),
      Seq("g1", "2", adversarial.length.toLong, adversarial),
      Seq("g2", "3", 0L, "")))
  }

  test("record ids longer than any fixed header window parse intact") {
    // pre-fix, parse read headers from a fixed 200-char substr: an id
    // pushing Content-Length past it yielded a null clen and corrupted
    // the rest of the blob
    val longId = "urn:uuid:" + ("x" * 300)
    val d = Seq(
      ("g1", longId, "first payload"),
      ("g1", "zz-short", "second payload")
    ).toDF("g", "id", "p")
    val back = WarcCodec.parse(
        WarcCodec.render(d, "g", "id", "p"), "group", "blob")
      .orderBy("rid")
    assert(rows(back) == Seq(
      Seq("g1", longId, 13L, "first payload"),
      Seq("g1", "zz-short", 14L, "second payload")))
  }
}

class BandPlannerSpec extends SparkSpec {
  import graft.operators.MinHashLSH

  test("planBands picks the divisor pair nearest the target threshold") {
    // 128 perms, target 0.5: b=32,r=4 gives (1/32)^(1/4) ~ 0.420;
    // b=16,r=8 gives (1/16)^(1/8) ~ 0.707 — 0.420 is closer to 0.5
    val (b, r, tMilli) = MinHashLSH.planBands(128, 0.5)
    assert(b * r == 128)
    assert((b, r) == (32, 4), s"got ($b,$r)")
    assert(tMilli == 420L)
    // high target -> few bands, long rows
    val (b2, r2, t2) = MinHashLSH.planBands(128, 0.9)
    assert(b2 * r2 == 128 && t2 > 800L && r2 > r)
  }

  test("sCurve is monotone and steep around the plan threshold") {
    val lo = MinHashLSH.sCurvePpm(32, 4, 0.2)
    val mid = MinHashLSH.sCurvePpm(32, 4, 0.42)
    val hi = MinHashLSH.sCurvePpm(32, 4, 0.7)
    assert(lo < mid && mid < hi)
    assert(lo < 55000L && hi > 990000L, s"lo=$lo hi=$hi")
  }
}

class StreamingRateAnomalySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.operators.RateAnomaly
  import graft.streaming.StreamingPipeline
  import java.sql.Timestamp

  test("hourly counts stream incrementally; anomaly report over the store matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF().toDF("k", "ts")
    // incremental leg: watermarked 1h windowed counts into a store
    val counts = StreamingPipeline.windowedCounts(df, "ts", "k",
      windowDur = "1 hour", slide = "1 hour", watermark = "0 seconds")
    val q = counts.writeStream.format("memory")
      .queryName("graft_rate_counts").outputMode("complete").start()
    def t(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:15:00")
    val events =
      (0 to 2).flatMap(h => Seq.fill(2)(("a", t(h)))) ++
        Seq.fill(12)(("a", t(3))) ++ Seq(("b", t(0)))
    mem.addData(events: _*)
    q.processAllAvailable()
    val store = spark.sql(
      "SELECT k AS key, window.start AS hour, n FROM graft_rate_counts")
    val streamed = rows(RateAnomaly.spikesFromCounts(store)
      .orderBy("key", "hour"))
    val batch = rows(RateAnomaly.hourlySpikes(
      events.toDF("k", "ts"), "k", "ts").orderBy("key", "hour"))
    assert(streamed == batch)
    assert(streamed.exists(r => r(6) == true)) // the hour-3 spike
    q.stop()
  }
}

class LicenseTagSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.LicenseTag
  import org.apache.spark.sql.functions._

  test("marker families, priority, restricted gate, unmarked default") {
    val rows = Seq(
      (1L, "foo Licensed under the Apache License, Version 2.0 bar"),
      (2L, "x CC BY 4.0 and creativecommons.org/licenses/by-nc/4.0 y"),
      (3L, "plain page, no marker"),
      (4L, "ALL RIGHTS RESERVED"), // case-folded matching
      (5L, "gnu general public license v3 plus mit license text"),
      // LGPL must tag lgpl, NOT substring-leak into the gpl quarantine
      (6L, "GNU Lesser General Public License, see LGPL-2.1 for terms"),
      (7L, "distributed under GPL-2.0 only"),
      (8L, "starts with gpl-3.0 at offset zero") // ^-boundary branch
    ).toDF("id", "text")
    val got = LicenseTag.annotate(rows, "text")
      .select("id", "license_tags", "license_primary", "license_restricted")
      .as[(Long, Seq[String], String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Seq("apache-2.0"), "apache-2.0", false)))
    // double marker: cc-by outranks cc-by-nc as primary, but the nc
    // marker still trips the restricted gate
    assert(got(2L) == ((Seq("cc-by", "cc-by-nc"), "cc-by", true)))
    assert(got(3L) == ((Seq(), "unmarked", false)))
    assert(got(4L) == ((Seq("all-rights-reserved"), "all-rights-reserved", true)))
    assert(got(5L) == ((Seq("gpl", "mit"), "mit", true)))
    assert(got(6L) == ((Seq("lgpl"), "lgpl", false)))
    assert(got(7L) == ((Seq("gpl"), "gpl", true)))
    assert(got(8L) == ((Seq("gpl"), "gpl", true)))
  }
}

class WindowLexiconDensitySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.WindowLexiconDensity
  import org.apache.spark.sql.functions._

  private def run(words: Seq[String], w: Int, k: Int) =
    WindowLexiconDensity(Seq("bad", "evil"), "ws", windowWords = w,
        minHits = k)(Seq(Tuple1(words)).toDF("ws"))
      .select("lex_hits", "max_window_hits", "window_start", "density_hit")
      .as[(Long, Long, Option[Long], Boolean)].head()

  test("clustered hits flag, diluted hits don't, ties take earliest") {
    // 3 hits inside positions 2..4: any 5-window catches all 3
    assert(run(Seq("a", "b", "bad", "evil", "bad", "c", "d"), 5, 3) ==
      ((3L, 3L, Some(2L), true)))
    // same 3 hits spread at 0, 10, 20 with window 5: max is 1
    val spread = (0 until 25).map(i =>
      if (i % 10 == 0) "bad" else s"w$i")
    assert(run(spread, 5, 3) == ((3L, 1L, Some(0L), false)))
    // no hits: zero max, null start
    assert(run(Seq("clean", "words"), 5, 1) == ((0L, 0L, None, false)))
    // case folding: BAD counts by default
    assert(run(Seq("BAD", "Evil"), 5, 2) == ((2L, 2L, Some(0L), true)))
    // mixed-case LEXICON entries must fold too
    assert(WindowLexiconDensity(Seq("Bad", "EVIL"), "ws", windowWords = 5,
        minHits = 2)(Seq(Tuple1(Seq("bad", "evil"))).toDF("ws"))
      .select("max_window_hits").as[Long].head() == 2L)
    // tie between two equally dense windows -> earliest start
    assert(run(Seq("bad", "x", "bad", "y", "bad"), 3, 2)._3 == Some(0L))
  }

  test("whole-doc ratio dilution is exactly what the window catches") {
    // 3 hits clustered in a 200-word doc: doc-level ratio 1.5% looks
    // clean; the 10-word window sees all 3
    val doc = (0 until 200).map {
      case 100 | 102 | 104 => "evil"
      case i => s"w$i"
    }
    val got = run(doc, 10, 3)
    assert(got == ((3L, 3L, Some(100L), true)))
  }
}

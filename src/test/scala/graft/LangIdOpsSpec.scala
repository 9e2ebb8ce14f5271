package graft

import org.apache.spark.sql.functions._
import graft.operators.{LangIdNgram, LangSegment}

class LangIdOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val labeled = Seq(
    ("en", 1L, "the cat and the dog and the bird"),
    ("en", 2L, "this is the thing that the people said"),
    ("de", 3L, "der hund und die katze und der vogel"),
    ("de", 4L, "das ist der dingen dass der leute")
  ).toDF("lang", "id", "text")

  test("charNgrams: sliding lowercase codepoint trigrams") {
    val got = Seq("AbCd").toDF("t")
      .select(LangIdNgram.charNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].head()
    assert(got == Seq("abc", "bcd"))
    assert(Seq("ab").toDF("t")
      .select(LangIdNgram.charNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].head().isEmpty)
  }

  test("profiles: per-language ranked top-N, ties by gram") {
    val p = LangIdNgram.trainProfiles(labeled, "lang", "text", topN = 5)
      .as[(String, String, Long)].collect()
    val en = p.filter(_._1 == "en").sortBy(_._3)
    assert(en.size == 5 && en.head._3 == 1L)
    // space-grams count (Cavnar-Trenkle keeps them): " th" leads en
    assert(en.head._2 == " th")
    assert(p.filter(_._1 == "de").size == 5)
  }

  test("classification recovers the training language on held-out text") {
    val profiles = LangIdNgram.trainProfiles(labeled, "lang", "text", topN = 40)
    val unseen = Seq(
      (10L, "the small dog said that this is the end"),
      (11L, "der kleine hund und die katze sind da")
    ).toDF("id", "text")
    val got = LangIdNgram
      .classify(unseen, "id", "text", profiles, topN = 40)
      .select("id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "en", 11L -> "de"))
  }

  test("distance is total and deterministic for profile-disjoint text") {
    val profiles = LangIdNgram.trainProfiles(labeled, "lang", "text", topN = 10)
    val got = LangIdNgram
      .classify(Seq((1L, "zzzqqqxxx")).toDF("id", "text"), "id", "text",
        profiles, topN = 10)
      .select("pred_lang", "dist").as[(String, Long)].head()
    // nothing matches either profile: dist = #docGrams * topN for both
    // languages; the tie breaks to the lexicographically smaller lang
    assert(got == ("de", 7L * 10L))
  }

  test("gram-less docs survive classification as 'und' with null dist") {
    val profiles = LangIdNgram.trainProfiles(labeled, "lang", "text", topN = 10)
    val got = LangIdNgram
      .classify(
        Seq((1L, "the cat and the dog"), (2L, "ab"), (3L, null.asInstanceOf[String]))
          .toDF("id", "text"),
        "id", "text", profiles, topN = 10)
      .select("id", "pred_lang")
      .as[(Long, String)].collect().toMap
    // ids 2 (shorter than n=3) and 3 (null) yield no grams — they must
    // stay in the output with the documented 'und' default, not vanish
    assert(got.keySet == Set(1L, 2L, 3L), got)
    assert(got(1L) == "en" && got(2L) == "und" && got(3L) == "und")
  }

  test("LangSegment: consecutive same-language paragraphs collapse, " +
    "short tails segment as 'und', empty paragraphs leave index gaps") {
    val profiles = LangIdNgram.trainProfiles(labeled, "lang", "text", topN = 10)
    val doc =
      "the cat and the dog" + "\n\n" +         // p0 en ┐ one segment
        "this is the thing the people said" + "\n\n" + // p1 en ┘
        "" + "\n\n" +                            // p2 empty: dropped
        "der hund und die katze" + "\n\n" +      // p3 de
        "ok"                                     // p4 und (2 chars)
    val got = LangSegment.segments(
        Seq((7L, doc)).toDF("id", "text"), "id", "text", profiles, topN = 10)
      .orderBy("seg_idx")
      .select("seg_idx", "lang", "start_para", "n_paras", "n_chars")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, "en", 0L, 2L, 19L + 33L),
      (1L, "de", 3L, 1L, 22L),
      (2L, "und", 4L, 1L, 2L)), got)
    // partitioning invariance
    val two = Seq((7L, doc), (8L, "der hund und die katze")).toDF("id", "text")
    assert(rows(LangSegment.segments(two, "id", "text", profiles, topN = 10)
        .orderBy("id", "seg_idx")) ==
      rows(LangSegment.segments(two.repartition(5), "id", "text", profiles,
        topN = 10).orderBy("id", "seg_idx")))
  }

  test("plan: classify is one row-local projection — no join, no shuffle, no window") {
    val profiles = LangIdNgram.trainProfiles(labeled, "lang", "text", topN = 10)
    // r13: the profile table inlines as kernel literals (CtClassifyExpr),
    // so the classification plan must carry NO join, NO exchange and NO
    // window — the whole classify is a projection over the input scan
    val plan = LangIdNgram
      .classify(labeled.select("id", "text"), "id", "text", profiles, topN = 10)
      .queryExecution.executedPlan.toString
    // (over a LOCAL relation the projection constant-folds away entirely
    // — ConvertToLocalRelation evaluates the kernel at plan time, which
    // is the strongest possible form of "row-local")
    assert(!plan.contains("Join") && !plan.contains("Exchange") &&
      !plan.contains("Window"), plan)
  }
}

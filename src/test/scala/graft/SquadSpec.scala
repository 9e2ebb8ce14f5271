package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** The reference's examples/squad.py + contrib qasper flow on
  * SQuAD-shaped nested records (FIXTURES.md §3): glom nested answers →
  * dedup → concatenate sectioned context → locate evidences → mask. */
class SquadSpec extends SparkSpec {
  import spark.implicits._

  private def squadDf = Seq(
    (
      "q1",
      "What is Spark?",
      Seq(Seq("Spark is an engine.", "It runs on clusters."), Seq("It is fast.")),
      Seq("Intro", "Perf"),
      (Seq("an engine", "an engine", "fast"), Seq(9L, 9L, 6L)),
      Seq("It is fast.", "not present")
    )
  ).toDF("id", "question", "context", "headers", "answers", "evidences")
    .withColumn("answers",
      col("answers").cast("struct<text:array<string>,answer_start:array<bigint>>"))

  test("glom nested answers; order-preserving dedup") {
    val out = Pipeline(
      Vector(
        Glom(Map("answer_texts" -> "answers.text")),
        UniqueAnswer("answer_texts")
      )
    )(squadDf)
    assert(rows(out.select("answer_texts")).head.head == List("an engine", "fast"))
  }

  test("sectioned context concatenates with headers; evidences located") {
    val out = Pipeline(
      Vector(
        ConcatenateContext("context", headerField = Some("headers")),
        AddEvidencesLocation("context", "evidences", "locations")
      )
    )(squadDf)
    val r = out.select("context", "locations").head()
    val ctx = r.getString(0)
    assert(ctx.contains("Intro\n") && ctx.contains("Perf\n"))
    val locs = rows(out.select("locations")).head.head.asInstanceOf[List[List[Long]]]
    // first evidence found at its char span; second absent -> (-1,-1)
    val (s, e) = (locs(0)(0).toInt, locs(0)(1).toInt)
    assert(ctx.substring(s, e) == "It is fast.")
    assert(locs(1) == List(-1L, -1L))
  }

  test("char evidence spans shift to token spans via encoder offsets") {
    val vocab = (Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++
      Seq("spark", "is", "fast", ".") ++
      "abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "abcdefghijklmnopqrstuvwxyz".map("##" + _))
      .zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
    val tok = WordPieceTokenizer(vocab)
    //               0123456789012
    val df = Seq(("spark is fast", Seq(Seq(9L, 13L), Seq(-1L, -1L))))
      .toDF("context", "locations")
    val out = Pipeline(
      Vector(
        EncodeFields(Seq("context"), tok, fieldsToReturnOffsetMapping = Seq("context")),
        ShiftEvidenceLocations("offset_context", "locations")
      )
    )(df)
    val locs = rows(out.select("locations")).head.head.asInstanceOf[List[List[Long]]]
    assert(locs(0) == List(9L, 13L)) // aligns with the token's char span
    assert(locs(1) == List(-1L, -1L))
  }

  test("ReplaceIfNoEvidence swaps labels only when mask is empty") {
    val df = Seq(
      (Seq(0L, 1L, 0L), Seq(7L, 8L)),
      (Seq(0L, 0L, 0L), Seq(7L, 8L))
    ).toDF("locations", "labels")
    val out = ReplaceIfNoEvidence("locations", "labels", Seq(99L))(df)
    assert(rows(out.select("labels")).map(_.head) ==
      Seq(List(7L, 8L), List(99L)))
  }

  test("evidence spans -> mask over context words") {
    val prepared = Pipeline(
      Vector(
        ConcatenateContext("context", headerField = Some("headers")),
        AddEvidencesLocation("context", "evidences", "locations")
      )
    )(squadDf)
      // char-span ranges -> mask over characters of the context
      .withColumn("chars", split(col("context"), ""))
      .withColumn("locations", filter(col("locations"), l => element_at(l, 1) >= 0))
    val masked = RangeToMask("mask", "chars", "locations")(prepared)
    val mask = rows(masked.select("mask")).head.head.asInstanceOf[List[Long]]
    assert(mask.count(_ == 1L) == "It is fast.".length)
  }
}

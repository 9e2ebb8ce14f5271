package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupTopK

class TopKOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("a", 1L, 30L, "x1"),
    ("a", 2L, 50L, "x2"),
    ("a", 3L, 50L, "x3"), // ties with 2 on score -> id breaks
    ("a", 4L, 10L, "x4"),
    ("b", 5L, 7L, "x5"),
    ("b", 6L, 9L, "x6"),
    ("c", 7L, 1L, "x7") // group smaller than k
  ).toDF("g", "id", "score", "tag")

  test("perGroup takes top-k descending with lexicographic tie-break") {
    val got = rows(
      GroupTopK
        .perGroup(docs, Seq("g"), Seq(col("score"), col("id")), 2,
          largest = true, payload = Seq("tag"))
        .orderBy("g", "rank"))
    assert(got == Seq(
      Seq("a", 1, 50L, 3L, "x3"), // score tie: larger id wins under `largest`
      Seq("a", 2, 50L, 2L, "x2"),
      Seq("b", 1, 9L, 6L, "x6"),
      Seq("b", 2, 7L, 5L, "x5"),
      Seq("c", 1, 1L, 7L, "x7")))
  }

  test("perGroup smallest-first flips every key") {
    val got = rows(
      GroupTopK
        .perGroup(docs, Seq("g"), Seq(col("score"), col("id")), 1,
          largest = false)
        .orderBy("g"))
    assert(got == Seq(
      Seq("a", 1, 10L, 4L),
      Seq("b", 1, 7L, 5L),
      Seq("c", 1, 1L, 7L)))
  }

  test("perGroup matches the window-rank formulation on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaAgg = GroupTopK
      .perGroup(d, Seq("source", "lang"), Seq(col("n_chars"), col("doc_id")), 3)
      .select("source", "lang", "rank", "n_chars", "doc_id")
    val viaWindow = d
      .withColumn(
        "rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source", "lang")
            .orderBy(col("n_chars").desc, col("doc_id").desc)))
      .filter(col("rank") <= 3)
      .select("source", "lang", "rank", "n_chars", "doc_id")
    assert(rows(viaAgg.orderBy("source", "lang", "rank")) ==
      rows(viaWindow.orderBy("source", "lang", "rank")))
  }

  test("plan is a two-stage object-hash aggregate, no Window, no sort of input") {
    val plan = GroupTopK
      .perGroup(docs, Seq("g"), Seq(col("score"), col("id")), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    // partial (map-side) + final: the heap folds BEFORE the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2, plan)
  }

  test("sampleK returns exactly min(k, group size) rows, deterministically") {
    val s1 = GroupTopK.sampleK(docs, Seq("g"), "id", 2)
    val s2 = GroupTopK.sampleK(docs, Seq("g"), "id", 2)
    val counts = s1.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(rows(s1.orderBy("g", "id")) == rows(s2.orderBy("g", "id")))
    assert(s1.columns.toSeq == Seq("g", "id", "score", "tag"))
  }

  test("sampleK with a custom hasher matches the window-over-hash oracle shape") {
    val viaAgg = GroupTopK
      .sampleK(docs, Seq("g"), "id", 2, c => md5(c.cast("string")))
      .select("g", "id")
    val viaWindow = docs
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("g")
            .orderBy(md5(col("id").cast("string")), col("id"))))
      .filter(col("rn") <= 2)
      .select("g", "id")
    assert(rows(viaAgg.orderBy("g", "id")) == rows(viaWindow.orderBy("g", "id")))
  }
}

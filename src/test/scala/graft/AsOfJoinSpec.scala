package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join semantics (backward, inclusive). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of picks latest right at-or-before, null when none") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L)
    ).toDF("id", "key", "t")
    val right = Seq(
      ("u1", 90L, "a"), ("u1", 200L, "b"), ("u2", 60L, "c")
    ).toDF("key", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("key"), "t", "rt")
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("a"))  // 90 <= 100, latest
    assert(out(2L).contains("b"))  // 200 <= 250
    assert(out(3L).isEmpty)        // no right <= 50 for u2
  }

  test("tie on timestamp matches (inclusive >=)") {
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "t")
    val right = Seq(("k", 100L, "exact")).toDF("key", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("key"), "t", "rt")
    assert(out.select("asof_v").as[String].head() == "exact")
  }

  test("forward as-of picks earliest right at-or-after, inclusive tie") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 500L), (4L, "u3", 7L)
    ).toDF("id", "key", "t")
    val right = Seq(
      ("u1", 100L, "tie"), ("u1", 300L, "later"), ("u2", 60L, "past"),
      ("u3", 7L, "same")
    ).toDF("key", "rt", "v")
    val out = AsOfJoin.forward(left, right, Seq("key"), "t", "rt")
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("tie"))   // 100 >= 100 inclusive, earliest
    assert(out(2L).contains("later")) // 300 is first at-or-after 250
    assert(out(3L).isEmpty)           // only right BEFORE 500 for u2
    assert(out(4L).contains("same"))
  }

  test("tolerance nulls stale matches but keeps the left row") {
    val left = Seq(
      (1L, "k", 100L), (2L, "k", 500L)
    ).toDF("id", "key", "t")
    val right = Seq(("k", 90L, "near")).toDF("key", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("key"), "t", "rt",
      within = Some((l, r) => l - r <= lit(50L)))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("near")) // 100-90 = 10 <= 50
    assert(out(2L).isEmpty)          // 500-90 = 410 > 50: nulled, row kept
    assert(out.size == 2)
  }

  test("multiple right columns carried through; left schema untouched") {
    val left = Seq((1L, "k", 10L, "keepme")).toDF("id", "key", "t", "extra")
    val right = Seq(("k", 5L, "x", 3.5)).toDF("key", "rt", "v", "w")
    val out = AsOfJoin.backward(left, right, Seq("key"), "t", "rt")
    assert(out.columns.toSet ==
      Set("id", "key", "t", "extra", "asof_rt", "asof_v", "asof_w"))
    val r = out.select("extra", "asof_v", "asof_w").head()
    assert(r.getString(0) == "keepme" && r.getString(1) == "x" && r.getDouble(2) == 3.5)
  }
}

package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range-join semantics: results must equal the naive theta join
  * (the O(n·m) plan the operator exists to avoid), pairs emitted exactly
  * once even when an overlap spans many bins, and the physical plan must
  * be an equi-join on the bin key — not a nested-loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  // deterministic pseudo-random fixtures: 120 points, 60 intervals, 3 keys
  private lazy val points: DataFrame = {
    val r = rng(7L)
    (0 until 120).map { i =>
      (i.toLong, s"k${math.floorMod(r.next(), 3)}", math.floorMod(r.next(), 1000L))
    }.toDF("pid", "key", "t")
  }
  private lazy val intervals: DataFrame = {
    val r = rng(11L)
    (0 until 60).map { i =>
      val s = math.floorMod(r.next(), 950L)
      // lengths from 0 to ~300: some intervals span many 50-wide bins
      (i.toLong, s"k${math.floorMod(r.next(), 3)}", s, s + math.floorMod(r.next(), 300L))
    }.toDF("iid", "ikey", "s", "e")
  }

  test("pointInInterval equals the naive theta join (keyed, inclusive bounds)") {
    val iv = intervals.withColumnRenamed("ikey", "key")
    val got = RangeJoin.pointInInterval(points, iv, "t", "s", "e",
        keys = Seq("key"), binWidth = 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.join(intervals,
        points("key") === intervals("ikey") &&
          points("t") >= intervals("s") && points("t") <= intervals("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty) // fixture sanity: the comparison is not vacuous
  }

  test("pointInInterval without keys; bounds are inclusive on both ends") {
    val p = Seq((1L, 10L), (2L, 20L), (3L, 21L)).toDF("pid", "t")
    val iv = Seq((100L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, "t", "s", "e", binWidth = 7L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // 10 and 20 inclusive, 21 out
  }

  test("intervalOverlap equals naive overlap join; each pair exactly once") {
    val a = intervals.select(col("iid").as("aid"), col("ikey").as("key"),
      col("s"), col("e"))
    val b = intervals.select(col("iid").as("bid"), col("ikey").as("key"),
      col("s"), col("e"))
    val out = RangeJoin.intervalOverlap(a, b, "s", "e", "s", "e",
        keys = Seq("key"), binWidth = 50L)
      .filter(col("aid") < col("b_bid"))
      .select("aid", "b_bid").as[(Long, Long)].collect().toList
    val want = a.join(b.withColumnRenamed("s", "bs").withColumnRenamed("e", "be"),
        Seq("key"))
      .filter(col("aid") < col("bid") &&
        col("s") <= col("be") && col("bs") <= col("e"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out.toSet == want,
      s"missing=${want -- out.toSet} extra=${out.toSet -- want}")
    // multi-bin overlaps (length up to 300, bin 50) must not duplicate
    assert(out.size == out.toSet.size, "pair emitted more than once")
    assert(want.nonEmpty)
  }

  test("physical plan is an equi-join on the bin key, not a nested loop") {
    val iv = intervals.withColumnRenamed("ikey", "key")
    val plan = RangeJoin.pointInInterval(points, iv, "t", "s", "e",
        keys = Seq("key"), binWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

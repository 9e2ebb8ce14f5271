package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrderLayout
import graft.functions.functions.interleave_bits

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("interleave_bits matches hand-computed Morton codes") {
    val got = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
      .select(interleave_bits(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].collect().toSeq
    // (5=101, 3=011) -> y2 x2 y1 x1 y0 x0 = 011011 = 27
    // x occupies even bit positions, y odd
    assert(got == Seq(27L, 0L, 21L, 42L))
  }

  test("interleave_bits three-way and high-bit truncation") {
    val got = Seq((1L, 1L, 1L), (8L, 0L, 0L))
      .toDF("x", "y", "w")
      .select(interleave_bits(Seq(col("x"), col("y"), col("w")), 3).as("z"))
      .as[Long].collect().toSeq
    // (1,1,1) -> bits 0,1,2 set = 7; 8 = 1000 has no low-3 bits -> 0
    assert(got == Seq(7L, 0L))
  }

  test("interleave_bits is null-propagating and codegen-planned") {
    // range input (not a folded LocalRelation) so the projection truly
    // runs the generated Java, not the interpreted eval
    val df = spark.range(2)
      .select(
        when(col("id") === 0, lit(1L)).otherwise(lit(null)).as("x"),
        lit(2L).as("y"))
      .select(interleave_bits(Seq(col("x"), col("y")), 4).as("z"))
      .orderBy(col("z").asc_nulls_last)
    // x=1 -> z bit 0; y=2 -> y's bit 1 lands at position 1*2+1=3 -> 8
    assert(rows(df) == Seq(Seq(9L), Seq(null)))
    // `*(n)` marks a WholeStageCodegen span — the projection computing
    // the z-value must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[interleavebitsexpr""".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("z-layout bounds per-partition extent in BOTH dimensions") {
    // 64x64 grid -> 16 z-clustered partitions. A single-column sort
    // leaves the other dimension spanning the full 0..63; z-order
    // keeps both extents near the 16x16-quadrant ideal.
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"),
      (col("id") % 64).cast("long").as("y"))
    def avgRange(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val s = ZOrderLayout.clusteringStats(df, Seq("x", "y"))
        .filter(col("col_name") === c)
        .agg(avg(col("max_v") - col("min_v"))).as[Double].head()
      s
    }
    val zed = ZOrderLayout.layout(grid, Seq(col("x"), col("y")), 16, bits = 6)
    assert(avgRange(zed, "x") < 24, "x extent not clustered")
    assert(avgRange(zed, "y") < 24, "y extent not clustered")
    val xSorted = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    assert(avgRange(xSorted, "y") > 60, "control: x-sort leaves y unclustered")
  }

  test("layout preserves the row multiset") {
    val grid = spark.range(1000).select(
      (col("id") * 7 % 100).as("x"), (col("id") * 13 % 100).as("y"))
    val zed = ZOrderLayout.layout(grid, Seq(col("x"), col("y")), 8, bits = 7)
    assert(zed.count() == 1000)
    assert(zed.exceptAll(grid).count() == 0 && grid.exceptAll(zed).count() == 0)
  }
}

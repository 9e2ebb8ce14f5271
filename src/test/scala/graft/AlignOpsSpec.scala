package graft

import org.apache.spark.sql.functions._
import graft.operators.GaleChurch

class AlignOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cost(a: Seq[Long], b: Seq[Long]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(GaleChurch.alignCost(col("a"), col("b")).as("c"))
      .as[Long].head()

  test("1-1 beads on near-equal lengths: sum of per-sentence gap costs") {
    // mc(100,105)=24 mc(50,48)=20 mc(80,82)=12
    assert(cost(Seq(100L, 50L, 80L), Seq(105L, 48L, 82L)) == 56L)
  }

  test("deletion on one side picks the skip bead, rest still aligns") {
    // skip a1 (450) + mc(50,52)=19 + mc(80,78)=12
    assert(cost(Seq(100L, 50L, 80L), Seq(52L, 78L)) == 481L)
  }

  test("2-1 merge bead beats skip+match when lengths add up") {
    // a=[60,40] vs b=[100]: merge = 230 + mc(100,100)=0; skips = 450+...
    assert(cost(Seq(60L, 40L), Seq(100L)) == 230L)
  }

  test("empty sides degrade to all-skip cost") {
    assert(cost(Seq.empty, Seq(10L, 20L)) == 900L)
    assert(cost(Seq(30L), Seq.empty) == 450L)
    assert(cost(Seq.empty, Seq.empty) == 0L)
  }

  test("sentenceLengths: terminator-delimited non-empty segments") {
    val got = Seq("One two. Three!  Four?").toDF("t")
      .select(GaleChurch.sentenceLengths(col("t")).as("l"))
      .as[Seq[Long]].head()
    assert(got == Seq(7L, 5L, 4L))
  }

  test("scorePairs: aligned pair scores far below a shuffled pair") {
    val df = Seq(
      (1L, Seq(100L, 50L, 80L), Seq(104L, 52L, 81L)),
      (2L, Seq(100L, 50L, 80L), Seq(10L, 300L, 42L))
    ).toDF("id", "src", "tgt")
    val got = GaleChurch.scorePairs(df, "src", "tgt")
      .select("id", "gc_cost_per_bead").as[(Long, Long)].collect().toMap
    assert(got(1L) < 20L && got(2L) > 100L, got.toString)
  }
}

package graft

import graft.operators.GraphOps

/** Scaled-integer PageRank: exact hand-computed ranks, dangling leak,
  * determinism. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // 1 → 2, 1 → 3, 2 → 1; node 3 dangles
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")

  test("two rounds replicate the integer recurrence exactly") {
    // scale 1000, n=3: teleport = 1000*15 div (100*3) = 50, r0 = 333
    // round 1: 1→{2,3}: (333*85) div 200 = 141; 2→1: (333*85) div 100 = 283
    //   r1 = (333, 191, 191)
    // round 2: 1→{2,3}: 141; 2→1: (191*85) div 100 = 162
    //   r2 = (212, 191, 191)
    val r = GraphOps.pageRankScaled(edges, iters = 2, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 212L, 2L -> 191L, 3L -> 191L))
  }

  test("zero iterations yield the uniform prior; ranks stay deterministic") {
    val r0 = GraphOps.pageRankScaled(edges, iters = 0, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(r0 == Map(1L -> 333L, 2L -> 333L, 3L -> 333L))
    val a = GraphOps.pageRankScaled(edges, iters = 3).as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRankScaled(edges.repartition(5), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("dangling mass leaks, self-loop retains it") {
    val total = GraphOps.pageRankScaled(edges, iters = 1, scale = 1000000L)
      .agg(org.apache.spark.sql.functions.sum($"rank_scaled"))
      .as[Long].head()
    assert(total < 1000000L) // node 3's damped mass left the system
    val looped = edges.union(Seq((3L, 3L)).toDF("src", "dst"))
    val total2 = GraphOps.pageRankScaled(looped, iters = 1, scale = 1000000L)
      .agg(org.apache.spark.sql.functions.sum($"rank_scaled"))
      .as[Long].head()
    assert(total2 > total) // retained (up to floor loss)
  }
}

package graft

/** Whole-catalog plan audit: builds the physical plan of EVERY catalog
  * query against sf0.001 and asserts the two structural anti-patterns
  * the 100-TB design forbids are absent everywhere:
  *
  *   - `CartesianProduct` — every join must be keyed or broadcast
  *     (bruteForce-style small-side probes compile to
  *     BroadcastNestedLoopJoin, which is allowed and bounded);
  *   - unpartitioned window specs — every `windowspecdefinition` must
  *     carry a partition key (tiny-table windows use the non-foldable
  *     constant key, SCALE.md §8).
  *
  * This is the blanket form of the per-query PlanSpec pins: a new
  * catalog entry cannot silently reintroduce either pattern. Building
  * a plan triggers the few construction-time side effects some queries
  * have (sink round-trips); sf0.001 keeps that cheap.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val unpartitionedWindow =
    "windowspecdefinition\\([^,)]*(ASC|DESC)".r

  test("no catalog query plans a CartesianProduct or an unpartitioned window") {
    val offenders = Queries.all.flatMap { q =>
      val plan =
        try q.run(spark, dir).queryExecution.executedPlan.toString
        catch {
          case e: Exception =>
            fail(s"${q.name}: plan build failed: ${e.getMessage}")
        }
      val problems = Seq(
        Option.when(plan.contains("CartesianProduct"))("CartesianProduct"),
        Option.when(unpartitionedWindow.findFirstIn(plan).isDefined)(
          "unpartitioned window")
      ).flatten
      if (problems.isEmpty) Nil else Seq(q.name -> problems)
    }
    assert(offenders.isEmpty,
      s"plan anti-patterns: ${offenders.mkString(", ")}")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations._

class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("hello"), "en", 5L),
    (2L, None, "en", 0L),          // null text, n_chars below range
    (3L, Some("x7!"), "xx", 3L),   // bad lang, bad pattern
    (4L, Some("ok"), "de", 2L)
  ).toDF("id", "text", "lang", "n_chars")

  private val checks = Seq(
    notNull("text"),
    oneOf("lang", Seq("en", "de")),
    inRange("n_chars", 1, 100),
    matches("text", "^[a-z ]*$"))

  test("audit counts violations per check in one pass") {
    val got = Expectations.audit(df, checks)
      .select("check_name", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("not_null:text") == (4L, 1L, 0))
    assert(got("one_of:lang") == (4L, 1L, 0))
    assert(got("in_range:n_chars") == (4L, 1L, 0))
    // null text -> rlike null -> NOT violated=null -> counts as no hit
    assert(got("matches:text") == (4L, 1L, 0))
    val tolerant = Expectations.audit(df, checks, tolerance = 1L)
      .filter(col("pass") === 1).count()
    assert(tolerant == 4L)
  }

  test("quarantine splits and annotates with every failed check") {
    val (clean, bad) = Expectations.quarantine(df, checks)
    assert(clean.select("id").as[Long].collect().toSet == Set(1L, 4L))
    val viol = bad.select(col("id"), col("violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viol(2L).toSet == Set("not_null:text", "in_range:n_chars"))
    assert(viol(3L).toSet == Set("one_of:lang", "matches:text"))
    assert(clean.columns.toSeq == df.columns.toSeq)
  }

  test("audit shuffles no data rows; quarantine is shuffle-free") {
    val plan = Expectations.audit(df, checks).queryExecution.executedPlan.toString
    // single-row partial aggregates meet in one tiny exchange
    assert(plan.contains("HashAggregate"), plan)
    val (clean, _) = Expectations.quarantine(df, checks)
    val qplan = clean.queryExecution.executedPlan.toString
    assert(!qplan.contains("Exchange"), qplan)
  }

  test("duplicateKeys surfaces only offending keys") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    val got = Expectations.duplicateKeys(d, Seq("k"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L)))
  }
}

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

class FilterFunnelSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Expectations
  import org.apache.spark.sql.functions._

  test("sequential attrition + order-free totals + unique failures") {
    // rows: (len, lang) — check1: len >= 10; check2: lang in {en, de}
    val df = Seq(
      (50L, "en"), // passes both
      (5L, "en"),  // fails 1 only
      (50L, "xx"), // fails 2 only
      (3L, "yy"),  // fails both (first-fails at 1)
      (60L, "de")  // passes both
    ).toDF("len", "lang")
    val checks = Seq(
      Expectations.inRange("len", 10, 1000),
      Expectations.oneOf("lang", Seq("en", "de")))
    val got = Expectations.funnel(df, checks)
      .orderBy("stage")
      .select("stage", "n_in", "n_failed_here", "n_kept",
        "n_fail_total", "n_unique_fail")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 2L, 3L, 2L, 1L),
      (2L, 3L, 1L, 2L, 2L, 1L)))
  }
}

class ChatOpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.ChatOps
  import org.apache.spark.sql.functions._

  private def conv(turns: (String, String)*) = turns.toSeq

  private def check(turns: Seq[(String, String)]): (Boolean, Boolean, Boolean, Boolean) = {
    val df = Seq(Tuple1(turns)).toDF("c")
      .select(transform(col("c"),
        t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
        .as("conv"))
    ChatOps.annotate(df, "conv")
      .select("alternates", "ends_assistant", "no_empty", "chat_valid")
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
  }

  test("valid shapes: with and without system turn, multi-round") {
    assert(check(conv("user" -> "hi", "assistant" -> "hello"))._4)
    assert(check(conv("system" -> "be nice", "user" -> "hi",
      "assistant" -> "hello", "user" -> "more", "assistant" -> "sure"))._4)
  }

  test("invalid shapes: each rule fires separately") {
    // ends on user
    val endsUser = check(conv("user" -> "hi", "assistant" -> "a", "user" -> "again"))
    assert(!endsUser._2 && !endsUser._4)
    // double user (no alternation)
    val doubleUser = check(conv("user" -> "hi", "user" -> "again", "assistant" -> "a"))
    assert(!doubleUser._1 && !doubleUser._4)
    // mid-conversation system turn
    val staleSystem = check(conv("user" -> "hi", "system" -> "x", "assistant" -> "a"))
    assert(!staleSystem._1 && !staleSystem._4)
    // empty content
    val empty = check(conv("user" -> "", "assistant" -> "a"))
    assert(!empty._3 && !empty._4)
    // system-only / single-turn
    assert(!check(conv("system" -> "s"))._4)
    assert(!check(conv("user" -> "hi"))._4)
  }

  test("stats: counts and char shares per role") {
    val df = Seq(Tuple1(conv("system" -> "sys", "user" -> "abcd",
        "assistant" -> "ab", "user" -> "x", "assistant" -> "yz"))).toDF("c")
      .select(transform(col("c"),
        t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
        .as("conv"))
    val got = ChatOps.annotate(df, "conv")
      .select("n_turns", "has_system", "n_user", "n_assistant",
        "chars_user", "chars_assistant")
      .as[(Long, Boolean, Long, Long, Long, Long)].head()
    assert(got == ((5L, true, 2L, 2L, 5L, 4L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/Great-Expectations
  * shape, Spark-first: a pipeline states row-level invariants
  * ("text is never null", "lang ∈ {…}", "n_chars ∈ [1, 1e6]") and gets
  * (a) an AUDIT — per-check violation counts in ONE aggregation pass
  * over the corpus, the thing you alert on before promoting a
  * snapshot; and (b) a QUARANTINE split — clean rows flow on, bad rows
  * land in a side table annotated with every check they failed, so a
  * 100-TB run never silently drops data and never reprocesses the
  * whole corpus to find out why a row vanished.
  *
  * Scale shape: audit is one map-side-combined `agg` (O(#checks)
  * output rows, no shuffle of data rows); quarantine is a narrow
  * codegen'd projection + filter (no shuffle at all). Key-uniqueness —
  * the one expectation that genuinely needs a shuffle — is a separate
  * explicit helper so its cost is visible at the call site. */
object Expectations {

  /** A named row-level invariant: `violated` is true on rows BREAKING
    * the expectation. */
  final case class Check(name: String, violated: Column)

  def notNull(field: String): Check =
    Check(s"not_null:$field", col(field).isNull)

  def inRange(field: String, lo: Long, hi: Long): Check =
    Check(s"in_range:$field",
      col(field).isNull || col(field) < lo || col(field) > hi)

  def oneOf(field: String, allowed: Seq[String]): Check =
    Check(s"one_of:$field", !col(field).isin(allowed: _*))

  def matches(field: String, regex: String): Check =
    Check(s"matches:$field", !col(field).rlike(regex))

  /** Per-check audit in one pass: (check_name, n_rows, n_violations,
    * pass). `pass` is 1 when violations ≤ `tolerance` rows. */
  def audit(
      df: DataFrame,
      checks: Seq[Check],
      tolerance: Long = 0L
  ): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      sum(c.violated.cast("long")).as(s"__ex_$i")
    }
    val row = df.agg(count(lit(1)).as("__ex_n"), aggs: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col("__ex_n").as("n_rows"),
        coalesce(col(s"__ex_$i"), lit(0L)).as("n_violations"),
        (coalesce(col(s"__ex_$i"), lit(0L)) <= tolerance).cast("int").as("pass"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Sequential filter-attrition funnel — the release-notes view of a
    * gate chain: applying `checks` IN ORDER, how many rows enter each
    * stage, fail there first, and survive; plus each check's
    * order-independent total failures and its UNIQUE failures (rows no
    * other check would catch — the number that justifies keeping the
    * check at all). One pass, one aggregate row, O(#checks) output;
    * rows never shuffle. */
  def funnel(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "funnel needs at least one check")
    // first failing stage per row, 0 = passes everything
    val firstFail = checks.zipWithIndex.reverse
      .foldLeft(lit(0L): Column) { case (acc, (c, i)) =>
        when(c.violated, lit(i + 1L)).otherwise(acc)
      }
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      val othersPass = checks.zipWithIndex
        .filter(_._2 != i)
        .map { case (o, _) => !o.violated }
        .reduceOption(_ && _).getOrElse(lit(true))
      Seq(
        sum((firstFail === (i + 1L)).cast("long")).as(s"__fn_ff_$i"),
        sum(c.violated.cast("long")).as(s"__fn_tot_$i"),
        sum((c.violated && othersPass).cast("long")).as(s"__fn_uniq_$i"))
    }
    val row = df.agg(count(lit(1)).as("__fn_n"), aggs: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      val enter = (0 until i).foldLeft(col("__fn_n"): Column) { (acc, j) =>
        acc - coalesce(col(s"__fn_ff_$j"), lit(0L))
      }
      val failedHere = coalesce(col(s"__fn_ff_$i"), lit(0L))
      struct(
        lit(i + 1L).as("stage"),
        lit(c.name).as("check_name"),
        enter.as("n_in"),
        failedHere.as("n_failed_here"),
        (enter - failedHere).as("n_kept"),
        coalesce(col(s"__fn_tot_$i"), lit(0L)).as("n_fail_total"),
        coalesce(col(s"__fn_uniq_$i"), lit(0L)).as("n_unique_fail"))
    }
    row.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Annotate every row with the names of the checks it fails
    * (`violationsField`, possibly empty) — the narrow projection both
    * split halves share. */
  def annotate(
      df: DataFrame,
      checks: Seq[Check],
      violationsField: String = "violations"
  ): DataFrame = {
    require(checks.nonEmpty, "annotate needs at least one check")
    val names = checks.map(c =>
      when(c.violated, lit(c.name)).otherwise(lit(null).cast("string")))
    df.withColumn(
      violationsField,
      filter(array(names: _*), x => x.isNotNull))
  }

  /** (clean, quarantined) split; quarantined rows keep their failure
    * list. Each side is a filter over the same annotated plan — with
    * the input cached or re-readable, neither side pays for the other. */
  def quarantine(
      df: DataFrame,
      checks: Seq[Check],
      violationsField: String = "violations"
  ): (DataFrame, DataFrame) = {
    val annotated = annotate(df, checks, violationsField)
    (annotated.filter(size(col(violationsField)) === 0).drop(violationsField),
      annotated.filter(size(col(violationsField)) > 0))
  }

  /** Keys of `cols` appearing more than once — the uniqueness
    * expectation. One hash-shuffled groupBy on the key columns;
    * output is only the offending keys. */
  def duplicateKeys(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "duplicateKeys needs at least one key column")
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }
}

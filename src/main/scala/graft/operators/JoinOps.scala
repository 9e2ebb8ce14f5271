package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY §2.10 lists
  * joins as "free from Spark"; backward as-of is the exception worth
  * building). Composed from existing ops per the custom-operator
  * preference order (union + keyed window), NOT a pairwise range join:
  *
  *   1. union the two sides with a side tag, right payload in a struct;
  *   2. one sort-shuffle on (key, time, side) — right-before-left on
  *      time ties so `t_left >= t_right` matches inclusively;
  *   3. running `last(payload, ignoreNulls)` per key picks the latest
  *      right row at-or-before each left row;
  *   4. keep left rows, unpack the payload.
  *
  * Cost: ONE shuffle of |L|+|R| rows keyed by the join key — the same
  * cost class as a sort-merge join, with none of the O(|L|·|R|) blowup a
  * naive time-range join risks. Skewed keys behave like any skewed
  * sort (AQE skew handling applies).
  */
object AsOfJoin {

  /** Backward (latest right at-or-before left) as-of join.
    * Output: all left columns + right's non-key/non-time columns renamed
    * `<rightPrefix><name>` (null when no right row precedes). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "asof_"
  ): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    val payloadCols = right.columns.filterNot(c => on.contains(c)).toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payloadCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val leftCols = left.columns.toSeq
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(payloadCols.map(col): _*))
    // align schemas: right contributes nulls for left-only columns
    val rAligned = leftCols.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lAligned = l.select((leftCols ++ Seq("__t", "__side", "__payload")).map(col): _*)
    val unioned = lAligned.unionByName(
      rAligned.select((leftCols ++ Seq("__t", "__side", "__payload")).map(col): _*),
      allowMissingColumns = false
    )
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payloadCols
      .foldLeft(matched) { (acc, c) =>
        acc.withColumn(s"$rightPrefix$c", col("__match").getField(c))
      }
      .drop("__t", "__side", "__payload", "__match")
  }
}

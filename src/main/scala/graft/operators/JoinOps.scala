package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY §2.10 lists
  * joins as "free from Spark"; as-of is the exception worth building).
  * Composed from existing ops per the custom-operator preference order
  * (union + keyed window), NOT a pairwise range join:
  *
  *   1. union the two sides with a side tag, right payload in a struct;
  *   2. one sort-shuffle on (key, time, side) — tie order chosen so the
  *      equality case matches inclusively in either direction;
  *   3. running `last(payload, ignoreNulls)` (backward) or `first`
  *      (forward) per key picks the nearest right row at-or-before /
  *      at-or-after each left row;
  *   4. optional tolerance predicate nulls out matches too far away
  *      (left rows are kept — LEFT-join semantics throughout);
  *   5. keep left rows, unpack the payload.
  *
  * Cost: ONE shuffle of |L|+|R| rows keyed by the join key — the same
  * cost class as a sort-merge join, with none of the O(|L|·|R|) blowup a
  * naive time-range join risks. Skewed keys behave like any skewed
  * sort (AQE skew handling applies).
  */
object AsOfJoin {

  /** Backward (latest right at-or-before left) as-of join.
    * Output: all left columns + right's non-key columns renamed
    * `<rightPrefix><name>` (null when no right row precedes, or when
    * `within(leftT, rightT)` is false for the nearest one).
    *
    * `within`: optional tolerance predicate over the (left, right) time
    * columns, e.g. `(l, r) => l.cast("long") - r.cast("long") <= 60`. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "asof_",
      within: Option[(Column, Column) => Column] = None
  ): DataFrame =
    join0(left, right, on, leftTime, rightTime, rightPrefix,
      forward = false, within)

  /** Forward (earliest right at-or-after left) as-of join; same contract
    * as [[backward]] mirrored in time. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "asof_",
      within: Option[(Column, Column) => Column] = None
  ): DataFrame =
    join0(left, right, on, leftTime, rightTime, rightPrefix,
      forward = true, within)

  private def join0(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String,
      forward: Boolean,
      within: Option[(Column, Column) => Column]
  ): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(within.isEmpty || !on.contains(rightTime),
      "tolerance needs the right time column outside the equality keys")
    val payloadCols = right.columns.filterNot(c => on.contains(c)).toSeq
    // tie order: the side evaluated "later" in scan order must see the
    // equal-time right row inside its window. Backward scans [start,
    // current] so right sorts BEFORE left on ties; forward scans
    // [current, end] so left sorts first.
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(lSide))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payloadCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val leftCols = left.columns.toSeq
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(rSide))
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
    val base = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
    val pick =
      if (forward)
        first(col("__payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val matched = unioned
      .withColumn("__match", pick)
      .filter(col("__side") === lSide)
    val guarded = within match {
      case Some(p) =>
        matched.withColumn(
          "__match",
          when(col("__match").isNotNull &&
            p(col("__t"), col("__match").getField(rightTime)), col("__match")))
      case None => matched
    }
    payloadCols
      .foldLeft(guarded) { (acc, c) =>
        acc.withColumn(s"$rightPrefix$c", col("__match").getField(c))
      }
      .drop("__t", "__side", "__payload", "__match")
  }
}

/** Range (interval) join — the second join operator Spark lacks natively
  * (SURVEY §2.10): match points to covering intervals, or intervals to
  * overlapping intervals, WITHOUT the O(|L|·|R|) broadcast-nested-loop a
  * naive `a.start <= b.ts AND b.ts <= a.end` theta join degenerates to.
  *
  * Plan: bin the time axis into fixed `binWidth` buckets. An interval
  * explodes onto every bucket it touches (linear in interval length /
  * binWidth — size binWidth near the MEDIAN interval length so the
  * typical fan-out is 1-2 buckets); a point maps to exactly one bucket.
  * The join is then a plain equi-join on (keys..., bucket) — shuffled,
  * AQE-skew-handled, broadcastable — followed by the exact predicate.
  * Interval×interval pairs that share several buckets are emitted ONCE
  * by keeping only the first bucket both touch (`bucket ==
  * max(floor(aStart/w), floor(bStart/w))`) — dedup by construction, no
  * `distinct` shuffle.
  */
object RangeJoin {

  /** Inner-join `points` to every `intervals` row whose
    * [startField, endField] (inclusive) covers the point's `ptField`,
    * matching equal `keys` when given. Times are treated as epoch
    * numerics (cast to long); output = point columns + interval columns. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptField: String,
      startField: String,
      endField: String,
      keys: Seq[String] = Nil,
      binWidth: Long = 3600L
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__rj_bin",
      floor(col(ptField).cast("long") / binWidth))
    val iv = intervals
      .withColumn(
        "__rj_bin",
        explode(sequence(
          floor(col(startField).cast("long") / binWidth),
          floor(col(endField).cast("long") / binWidth)))
      )
    p.join(iv, keys :+ "__rj_bin")
      .filter(
        col(ptField).cast("long") >= col(startField).cast("long") &&
          col(ptField).cast("long") <= col(endField).cast("long"))
      .drop("__rj_bin")
  }

  /** Inner-join rows of `a` and `b` whose [start, end] intervals overlap
    * (inclusive), matching equal `keys` when given. Each overlapping
    * pair is emitted exactly once. `b`'s columns arrive prefixed so the
    * two sides' fields never collide. */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: String,
      aEnd: String,
      bStart: String,
      bEnd: String,
      keys: Seq[String] = Nil,
      binWidth: Long = 3600L,
      bPrefix: String = "b_"
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn(
        "__rj_bin",
        explode(sequence(
          floor(col(s).cast("long") / binWidth),
          floor(col(e).cast("long") / binWidth)))
      )
    val bRenamed = b.columns.filterNot(keys.contains)
      .foldLeft(b)((d, c) => d.withColumnRenamed(c, s"$bPrefix$c"))
    val ab = binned(a, aStart, aEnd)
      .join(binned(bRenamed, s"$bPrefix$bStart", s"$bPrefix$bEnd"),
        keys :+ "__rj_bin")
    val bS = col(s"$bPrefix$bStart").cast("long")
    val bE = col(s"$bPrefix$bEnd").cast("long")
    val aS = col(aStart).cast("long")
    val aE = col(aEnd).cast("long")
    ab.filter(aS <= bE && bS <= aE)
      // first common bucket: dedup multi-bucket overlaps by construction
      .filter(col("__rj_bin") === floor(greatest(aS, bS) / binWidth))
      .drop("__rj_bin")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.interleave_bits

/** Multi-dimensional data layout for scan pruning — the write-side
  * optimization that matters most at 100 TB, where the fastest query
  * is the one that never opens the file. Sorting output by ONE column
  * gives parquet min/max pruning on that column only; Z-ORDERING by
  * 2-3 columns (range-partition + sort on the Morton interleave of
  * their bits, the Delta/Iceberg `OPTIMIZE ZORDER BY` recipe) keeps
  * every file's footprint small in EVERY clustered dimension at once,
  * so predicates on any of them — or any conjunction — prune files.
  *
  * Scale shape: one `repartitionByRange` (sampled bounds, one shuffle
  * — the shuffle you were already paying to compact output files)
  * plus a partition-local sort. Nothing is collected; the z-value is
  * a codegen'd long expression ([[graft.functions.InterleaveBitsExpr]]).
  */
object ZOrderLayout {

  /** The z-value column: Morton interleave of the low `bits` bits of
    * 2-3 non-negative integral columns. Callers normalize first —
    * monotone transforms (epoch-day, bucket id, quantile rank) are
    * fine since z-order only needs per-dimension order, not scale. */
  def zvalue(cols: Seq[Column], bits: Int = 21): Column =
    interleave_bits(cols, bits)

  /** Rewrite `df` into `numPartitions` z-clustered partitions: files
    * written from the result have bounded min/max extent in every
    * `cols` dimension. */
  def layout(
      df: DataFrame,
      cols: Seq[Column],
      numPartitions: Int,
      bits: Int = 21
  ): DataFrame = {
    val z = zvalue(cols, bits).as("__zorder")
    df.withColumn("__zorder", z)
      .repartitionByRange(numPartitions, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }

  /** Layout audit: per-partition (partition_id, col_name, min, max,
    * n) in long format — the would-be parquet footer stats. Collecting
    * this is O(#partitions · #cols); use it to verify a layout's
    * pruning power (sum of ranges per dimension) before a 100-TB
    * rewrite. */
  def clusteringStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val withPid = df.withColumn("__pid", spark_partition_id())
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("long").as(s"__min_$c"),
        max(col(c)).cast("long").as(s"__max_$c"))
    }
    val row = withPid
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        col("__n").as("n"))
    }
    row
      .select(col("__pid").as("partition_id"),
        explode(array(entries: _*)).as("e"))
      .select("partition_id", "e.*")
  }
}

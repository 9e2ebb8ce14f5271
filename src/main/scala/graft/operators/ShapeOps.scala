package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cardinality-changing / reshaping mappers — the reference's "joins &
  * aggs" (SURVEY.md §2.4).
  * Ref: /root/reference/src/smashed/mappers/shape.py,
  * /root/reference/src/smashed/mappers/batchers.py.
  * 1→N ops compile to `explode` over generated offsets; N→1 batching uses
  * a shuffle keyed on batch id (ordered mode) or stays partition-local
  * (scalable mode). All per-row logic is native expressions.
  */

/** Repeatedly flatten List[List[…]] to a flat list. The reference loops at
  * runtime (shape.py:23-33); our schema tells us the depth statically, so
  * the loop unrolls at plan time. */
final case class Flatten(fields: Seq[String]) extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  override protected def build(df: DataFrame): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      var c = col(f)
      var dt = acc.schema(f).dataType
      while (dt match {
          case ArrayType(ArrayType(_, _), _) => true
          case _                             => false
        }) {
        c = flatten(c)
        dt = dt.asInstanceOf[ArrayType].elementType
      }
      acc.withColumn(f, c)
    }
}

/** Concatenate list-of-lists into one list (exactly one level, per listed
  * field or all array-of-array fields). Ref: multiseq.py:519-547. */
final case class SequencesConcatenate(concatFields: Option[Seq[String]] = None)
    extends Mapper {
  override def inputFields: Seq[String] = concatFields.getOrElse(Nil)
  override def outputFields: Seq[String] = concatFields.getOrElse(Nil)
  override protected def build(df: DataFrame): DataFrame = {
    val targets = concatFields.getOrElse(
      df.schema.fields.collect {
        case StructField(n, ArrayType(ArrayType(_, _), _), _, _) => n
      }.toSeq
    )
    targets.foldLeft(df)((acc, f) => acc.withColumn(f, flatten(col(f))))
  }
}

/** Explode parallel list-fields into one row per element; non-unpacked
  * fields are dropped or repeated. Ref: shape.py:36-173.
  * Implementation: `arrays_zip` + `explode` — repeat of other columns is
  * automatic in Spark; a narrow op, no shuffle.
  * Note: the reference's `zip` stops at the shortest list; `arrays_zip`
  * pads with nulls to the longest (documented divergence — parallel fields
  * are equal-length in every reference use). */
final case class Unpacking(
    fieldsToUnpack: Option[Seq[String]] = None,
    fieldsToIgnore: Option[Seq[String]] = None,
    ignoredBehavior: Option[String] = None
) extends Mapper {
  require(
    fieldsToUnpack.isEmpty || fieldsToIgnore.isEmpty,
    "Must specify only one of fieldsToUnpack or fieldsToIgnore"
  )
  require(
    (fieldsToUnpack.isEmpty && fieldsToIgnore.isEmpty) ||
      ignoredBehavior.exists(Set("drop", "repeat")),
    "ignoredBehavior must be 'drop' or 'repeat' when fields are specified"
  )
  override def inputFields: Seq[String] =
    fieldsToUnpack.getOrElse(Nil) ++ fieldsToIgnore.getOrElse(Nil)
  override def outputFields: Seq[String] = inputFields

  override protected def build(df: DataFrame): DataFrame = {
    val unpack: Seq[String] = (fieldsToUnpack, fieldsToIgnore) match {
      case (Some(fs), _) => fs
      case (_, Some(ig)) => df.columns.filterNot(ig.toSet).toSeq
      case _             => df.columns.toSeq
    }
    require(unpack.nonEmpty, "No fields to unpack!")
    val keepRest = ignoredBehavior.forall(_ == "repeat") // default: all unpacked
    val zipped = explode(arrays_zip(unpack.map(col): _*)).as("__graft_z")
    val rest = df.columns.filterNot(unpack.toSet)
    val restCols = if (keepRest) rest.toSeq else Nil
    // preserve original column order among selected fields
    val outCols = df.columns.toSeq
      .filter(c => unpack.contains(c) || restCols.contains(c))
      .map { c =>
        if (unpack.contains(c)) col("__graft_z").getField(c).as(c) else col(c)
      }
    df.withColumn("__graft_z", zipped).select(outCols: _*)
  }
}

object Strider {
  /** Window start offsets replicating shape.py:217-237 exactly, including
    * the quirk that a shorter-than-max sequence is emitted once more ahead
    * of the strided windows when keepLast=true. */
  def offsets(
      sz: Column,
      maxLength: Int,
      stride: Int,
      keepLast: Boolean
  ): Column = {
    val shortYield = when(sz < maxLength, array(lit(0L)))
      .otherwise(array().cast(ArrayType(LongType)))
    val strided =
      if (keepLast) sequence(lit(0L), sz.cast(LongType), lit(stride.toLong))
      else
        when(
          sz >= maxLength,
          sequence(lit(0L), sz.cast(LongType) - maxLength, lit(stride.toLong))
        ).otherwise(array().cast(ArrayType(LongType)))
    concat(shortYield, strided)
  }
}

/** Slide a window of `maxLength` / step `stride` over list field(s),
  * emitting one row per slice. Ref: shape.py:176-247.
  * Pure native expressions: generate offsets → explode → slice. */
final case class SingleSequenceStrider(
    fieldsToStride: Seq[String],
    maxLength: Int,
    stride: Option[Int] = None,
    keepLast: Boolean = false
) extends Mapper {
  private val step = stride.getOrElse(maxLength)
  override def inputFields: Seq[String] = fieldsToStride
  override def outputFields: Seq[String] = fieldsToStride
  override protected def build(df: DataFrame): DataFrame = {
    val ref = fieldsToStride.head
    val offs = Strider.offsets(size(col(ref)), maxLength, step, keepLast)
    val exploded = df.withColumn("__graft_off", explode(offs))
    val outCols = df.columns.toSeq.map { c =>
      if (fieldsToStride.contains(c))
        slice(col(c), col("__graft_off") + 1, lit(maxLength)).as(c)
      else col(c)
    }
    exploded.select(outCols: _*)
  }
}

/** Strider that consults a `[start,end]` locations field; windows not
  * overlapping any location get fields replaced from `replacementMap`.
  * Ref: shape.py:250-294. The reference tracks `cum_len` as the cumulative
  * sum of *emitted window lengths* (not window starts) — replicated here
  * with an `aggregate` fold over the preceding offsets. */
final case class SingleSequenceStriderWithLocations(
    fieldsToStride: Seq[String],
    maxLength: Int,
    fieldWithLocations: String,
    fieldsReplacementMap: Map[String, Any] = Map.empty,
    stride: Option[Int] = None
) extends Mapper {
  private val step = stride.getOrElse(maxLength)
  override def inputFields: Seq[String] =
    fieldsToStride :+ fieldWithLocations
  override def outputFields: Seq[String] =
    fieldsToStride ++ fieldsReplacementMap.keys :+ fieldWithLocations

  override protected def build(df: DataFrame): DataFrame = {
    val ref = fieldsToStride.head
    val sz = size(col(ref)).cast(LongType)
    def winLen(off: Column): Column =
      greatest(lit(0L), least(lit(maxLength.toLong), sz - off))

    val withOffs = df
      .withColumn(
        "__graft_offs",
        Strider.offsets(size(col(ref)), maxLength, step, keepLast = false)
      )
      .select(
        col("*"),
        posexplode(col("__graft_offs")).as(Seq("__graft_k", "__graft_off"))
      )
    val cumLen = aggregate(
      slice(col("__graft_offs"), lit(1), col("__graft_k")),
      lit(0L),
      (acc, o) => acc + winLen(o)
    )
    val withCum = withOffs
      .withColumn("__graft_cum", cumLen)
      .withColumn("__graft_end", cumLen + winLen(col("__graft_off")))
    val hit = exists(
      col(fieldWithLocations),
      l => {
        val s = element_at(l, 1).cast(LongType)
        val e = element_at(l, 2).cast(LongType)
        (col("__graft_cum") <= s && s < col("__graft_end")) ||
        (col("__graft_cum") < e && e <= col("__graft_end"))
      }
    )
    val outCols = df.columns.toSeq.map { c =>
      if (fieldsToStride.contains(c))
        slice(col(c), col("__graft_off") + 1, lit(maxLength)).as(c)
      else if (fieldsReplacementMap.contains(c))
        when(hit, col(c)).otherwise(lit(fieldsReplacementMap(c))).as(c)
      else col(c)
    }
    withCum.select(outCols: _*)
  }
}

/** Group rows into batches of `batchSize`; each output row holds columnar
  * lists. Ref: batchers.py:6-60.
  *
  * Spark has no global row order, so two modes (SURVEY.md §7.3):
  *   - `orderBy=Some(cols)`: deterministic batching by the given key —
  *     a range-partitioned global sort + `zipWithIndex` assigns global
  *     row numbers WITHOUT funnelling all rows through one partition
  *     (a bare `row_number()` window would), then one shuffle groups
  *     batch members;
  *   - `orderBy=None`: partition-local batching via `mapPartitions`-style
  *     grouping — zero shuffle, order within a partition.
  * `batchSize <= 0` means "max" (one batch, ordered mode only).
  */
final case class FixedBatchSize(
    batchSize: Int,
    keepLast: Boolean = true,
    orderBy: Seq[String] = Nil
) extends Mapper {
  override protected def build(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    if (orderBy.nonEmpty) {
      val bs = if (batchSize <= 0) Long.MaxValue else batchSize.toLong
      val sorted = df.orderBy(orderBy.map(col): _*)
      val idSchema = StructType(
        sorted.schema.fields :+ StructField("__graft_rn", LongType)
      )
      // zipWithIndex preserves the range-partitioned sort order, so row
      // numbers are global WITHOUT a single-partition row_number window
      val withId = df.sparkSession
        .createDataFrame(
          sorted.rdd.zipWithIndex().map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
          },
          idSchema
        )
        .withColumn("__graft_bid", (col("__graft_rn") / bs).cast(LongType))
      val packed = withId
        .groupBy(col("__graft_bid"))
        .agg(
          sort_array(
            collect_list(struct(col("__graft_rn") +: cols.map(col): _*))
          ).as("__graft_batch"),
          count(lit(1)).as("__graft_n")
        )
      val filtered =
        if (keepLast) packed
        else packed.filter(col("__graft_n") === lit(bs))
      filtered
        .select(
          col("__graft_bid") +:
            cols.map(c =>
              transform(col("__graft_batch"), r => r.getField(c)).as(c)
            ): _*
        )
        .orderBy("__graft_bid")
        .drop("__graft_bid")
    } else {
      // partition-local: no shuffle; ragged tails per partition
      val bs = if (batchSize <= 0) Int.MaxValue else batchSize
      val keep = keepLast
      val schema = StructType(df.schema.fields.map { f =>
        f.copy(dataType = ArrayType(f.dataType, containsNull = true))
      })
      val enc = org.apache.spark.sql.Encoders.row(schema)
      df.mapPartitions { it =>
        it.grouped(bs)
          .filter(g => keep || g.size == bs)
          .map { g =>
            org.apache.spark.sql.Row.fromSeq(
              cols.indices.map(i => g.map(_.get(i)))
            )
          }
      }(enc)
    }
  }
}

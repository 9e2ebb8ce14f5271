package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mask <-> indices/ranges mappers.
  * Ref: /root/reference/src/smashed/mappers/masks.py.
  * All row-local, expressed with higher-order functions (no UDFs).
  */

/** indices list (or scalar) → 0/1 mask sized like a reference field.
  * Ref: masks.py:9-59. */
final case class IndicesToMask(
    maskFieldName: String,
    referenceFieldName: String,
    locationsFieldName: String,
    maskOffValue: Long = 0,
    maskFillValue: Long = 1
) extends Mapper {
  override def inputFields: Seq[String] =
    Seq(locationsFieldName, referenceFieldName)
  override def outputFields: Seq[String] = Seq(maskFieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val locs = df.schema(locationsFieldName).dataType match {
      case _: ArrayType => col(locationsFieldName)
      case _            => array(col(locationsFieldName))
    }
    df.withColumn(
      maskFieldName,
      transform(
        SeqUtil.seq0(size(col(referenceFieldName))),
        i =>
          when(array_contains(locs, i), lit(maskFillValue))
            .otherwise(lit(maskOffValue))
      )
    )
  }
}

/** `[start,end)` pair(s) → mask. Ref: masks.py:62-87. Accepts a single
  * pair (array<long>) or a list of pairs (array<array<long>>). Replicates
  * the reference's empty-locations case returning literal zeros. */
final case class RangeToMask(
    maskFieldName: String,
    referenceFieldName: String,
    locationsFieldName: String,
    maskOffValue: Long = 0,
    maskFillValue: Long = 1
) extends Mapper {
  override def inputFields: Seq[String] =
    Seq(locationsFieldName, referenceFieldName)
  override def outputFields: Seq[String] = Seq(maskFieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val pairs: Column = df.schema(locationsFieldName).dataType match {
      case ArrayType(ArrayType(_, _), _) => col(locationsFieldName)
      case ArrayType(_, _)               => array(col(locationsFieldName))
      case other =>
        throw new IllegalArgumentException(
          s"RangeToMask: $locationsFieldName has type $other"
        )
    }
    val n = size(col(referenceFieldName)).cast(LongType)
    val mask = transform(
      SeqUtil.seq0(n),
      i =>
        when(
          exists(
            pairs,
            p =>
              element_at(p, 1).cast(LongType) <= i &&
                i < element_at(p, 2).cast(LongType)
          ),
          lit(maskFillValue)
        ).otherwise(lit(maskOffValue))
    )
    // masks.py:66-69: empty locations → a mask of literal zeros
    df.withColumn(
      maskFieldName,
      when(
        size(col(locationsFieldName)) === 0,
        transform(SeqUtil.seq0(n), _ => lit(0L))
      ).otherwise(mask)
    )
  }
}

/** mask → list of indices where mask == fill; optionally enforce exactly
  * one location (then emit a scalar). Ref: masks.py:90-143. */
final case class MaskToIndices(
    maskFieldName: String,
    locationsFieldName: String,
    maskOffValue: Long = 0,
    maskFillValue: Long = 1,
    enforceSingleLocation: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = Seq(maskFieldName)
  override def outputFields: Seq[String] = Seq(locationsFieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val idxs = filter(
      SeqUtil.seq0(size(col(maskFieldName))),
      i => element_at(col(maskFieldName), (i + 1).cast(IntegerType))
        .cast(LongType) === lit(maskFillValue)
    )
    val out =
      if (enforceSingleLocation)
        when(size(idxs) === 1, element_at(idxs, 1)).otherwise(
          raise_error(concat(
            lit(s"Expected exactly one location for mask field " +
              s"'$maskFieldName' but got "),
            size(idxs).cast(StringType)
          ))
        )
      else idxs
    df.withColumn(locationsFieldName, out)
  }
}

/** mask → list of `[start,end)` runs of consecutive fill positions.
  * Ref: masks.py:146-178 (numpy diff/split). Implemented as the native
  * [[graft.functions.RunLengthRanges]] expression — one linear pass per
  * row (the `aggregate`-fold formulation rebuilt an array per element). */
final case class MaskToRange(
    maskFieldName: String,
    locationsFieldName: String,
    maskOffValue: Long = 0,
    maskFillValue: Long = 1,
    enforceSingleLocation: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = Seq(maskFieldName)
  override def outputFields: Seq[String] = Seq(locationsFieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val runs = graft.functions.functions.run_length_ranges(
      col(maskFieldName).cast(ArrayType(LongType)),
      lit(maskFillValue)
    )
    val out =
      if (enforceSingleLocation)
        when(size(runs) === 1, element_at(runs, 1)).otherwise(
          raise_error(concat(
            lit(s"Expected exactly one location for mask field " +
              s"'$maskFieldName' but got "),
            size(runs).cast(StringType)
          ))
        )
      else runs
    df.withColumn(locationsFieldName, out)
  }
}

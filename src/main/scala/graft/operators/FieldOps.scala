package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / field-level mappers.
  * Reference: /root/reference/src/smashed/mappers/fields.py,
  * /root/reference/src/smashed/mappers/glom.py,
  * /root/reference/src/smashed/mappers/types.py.
  * All compile to native Column expressions so Catalyst column pruning and
  * predicate pushdown apply (SURVEY.md §4.2).
  */

/** Keep-only or drop listed fields (XOR-validated).
  * Ref: mappers/fields.py:17-67. */
final case class ChangeFields(
    keepFields: Seq[String] = Nil,
    dropFields: Seq[String] = Nil,
    raiseOnMissing: Boolean = true
) extends Mapper {
  require(
    keepFields.nonEmpty ^ dropFields.nonEmpty,
    "Must specify exactly one of keepFields or dropFields"
  )
  override def inputFields: Seq[String] =
    if (raiseOnMissing) keepFields ++ dropFields else Nil
  override def outputFields: Seq[String] = keepFields
  override protected def build(df: DataFrame): DataFrame =
    if (keepFields.nonEmpty) df.select(keepFields.map(col): _*)
    else df.drop(dropFields: _*)
}

/** Rename via map; optionally drop unmapped fields.
  * Ref: mappers/fields.py:70-100. */
final case class RenameFields(
    renameMap: Map[String, String],
    removeRest: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = renameMap.keys.toSeq
  override def outputFields: Seq[String] = renameMap.values.toSeq
  override protected def build(df: DataFrame): DataFrame = {
    val renamed = df.withColumnsRenamed(renameMap)
    if (removeRest) {
      // preserve the input column order, like the reference's dict-comp
      val keep = df.columns.filter(renameMap.contains).map(renameMap)
      renamed.select(keep.toIndexedSeq.map(col): _*)
    } else renamed
  }
}

/** Add a constant field; `shapeLike` repeats it to match the length of an
  * existing array field. Ref: mappers/fields.py:103-131. */
final case class MakeField(
    fieldName: String,
    value: Any,
    shapeLike: Option[String] = None
) extends Mapper {
  override def inputFields: Seq[String] = shapeLike.toSeq
  override def outputFields: Seq[String] = Seq(fieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val c = shapeLike match {
      case Some(ref) => array_repeat(lit(value), size(col(ref)))
      case None      => lit(value)
    }
    df.withColumn(fieldName, c)
  }
}

/** Assign integer ids to values of a field.
  *
  * Ref: mappers/fields.py:134-196. The reference memoizes value→id in a
  * driver-side dict in order of first appearance — inherently sequential.
  * Distributed semantics (documented divergence, SURVEY.md §7.3):
  *   - sameIdForRepeated=true: ids are dense 0..n-1 assigned in *value
  *     order* (sorted distinct + zipWithIndex — scales to any cardinality,
  *     no single-partition window);
  *   - sameIdForRepeated=false: ids are 0..n-1 in dataset order (requires
  *     a deterministic upstream sort for reproducibility).
  */
final case class EnumerateField(
    fieldToEnumerate: String,
    destinationField: Option[String] = None,
    sameIdForRepeated: Boolean = true,
    appearanceOrder: Boolean = false
) extends Mapper {
  private def dest = destinationField.getOrElse(fieldToEnumerate)
  override def inputFields: Seq[String] = Seq(fieldToEnumerate)
  override def outputFields: Seq[String] = Seq(dest)
  override protected def build(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (sameIdForRepeated && appearanceOrder) {
      // the reference's exact semantics (fields.py:180-196): ids in order
      // of FIRST APPEARANCE. Distributed: row index → min index per
      // value → rank values by that min. Two shuffles, no driver state;
      // "appearance" is the dataset's partition-then-row order (stable
      // for a deterministic upstream sort or source).
      import org.apache.spark.sql.expressions.Window
      val idxField = "__graft_idx"
      val schema = StructType(
        df.schema.fields :+ StructField(idxField, LongType)
      )
      val indexed = spark.createDataFrame(
        df.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        },
        schema
      )
      // rank first-appearance indices with sorted zipWithIndex — the sort
      // range-partitions and zipWithIndex preserves global order, so the
      // distinct values never funnel through one partition (an unpartitioned
      // row_number window would).
      val firstVals = indexed
        .groupBy(col(fieldToEnumerate))
        .agg(min(col(idxField)).as("__graft_first"))
        .orderBy(col("__graft_first"))
      val fvSchema = StructType(
        firstVals.schema.fields :+ StructField("__graft_enum_id", LongType)
      )
      val firstSeen = spark.createDataFrame(
        firstVals.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        },
        fvSchema
      ).drop("__graft_first")
      val joined = indexed.join(firstSeen, Seq(fieldToEnumerate), "left")
      val out =
        if (dest == fieldToEnumerate)
          joined.drop(fieldToEnumerate).withColumnRenamed("__graft_enum_id", dest)
        else joined.withColumnRenamed("__graft_enum_id", dest)
      val ordered =
        if (df.columns.contains(dest) || dest == fieldToEnumerate)
          df.columns.toSeq
        else df.columns.toSeq :+ dest
      // restore the mapper's row-order contract (reference streams rows in
      // order). This is a range-partitioned distributed sort on a long key —
      // scalable, not a funnel — and callers that don't need row order can
      // use the default mode.
      out.orderBy(col(idxField)).select(ordered.map(col): _*)
    } else if (sameIdForRepeated) {
      // sorted-distinct + zipWithIndex: the sort range-partitions, and
      // zipWithIndex preserves the global order => contiguous ids without
      // ever funnelling the data through one partition.
      val distinctVals = df.select(col(fieldToEnumerate)).distinct()
        .orderBy(col(fieldToEnumerate))
      val schema = StructType(
        distinctVals.schema.fields :+ StructField("__graft_enum_id", LongType)
      )
      val withIds = spark.createDataFrame(
        distinctVals.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        },
        schema
      )
      val joined = df.join(withIds, Seq(fieldToEnumerate), "left")
      val out =
        if (dest == fieldToEnumerate)
          joined.drop(fieldToEnumerate)
            .withColumnRenamed("__graft_enum_id", dest)
        else joined.withColumnRenamed("__graft_enum_id", dest)
      // restore original column order (+ dest appended if new)
      val ordered =
        if (df.columns.contains(dest) || dest == fieldToEnumerate)
          df.columns.toSeq
        else df.columns.toSeq :+ dest
      out.select(ordered.map(col): _*)
    } else {
      val schema = StructType(
        df.schema.fields.filter(_.name != dest) :+ StructField(dest, LongType)
      )
      val keep = df.columns.filter(_ != dest)
      spark.createDataFrame(
        df.select(keep.toIndexedSeq.map(col): _*).rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        },
        schema
      )
    }
  }
}

/** Extract nested paths into flat fields, e.g. "answers.text" → "text".
  * Ref: mappers/glom.py:51-71. Spark's Column dot-path handles struct
  * nesting natively and maps over array-of-struct. */
final case class Glom(specFields: Map[String, String]) extends Mapper {
  override def inputFields: Seq[String] = specFields.values.toSeq
  override def outputFields: Seq[String] = specFields.keys.toSeq
  override protected def build(df: DataFrame): DataFrame =
    specFields.foldLeft(df) { case (acc, (out, path)) =>
      acc.withColumn(out, col(path))
    }
}

object CastTypes {
  /** Reference cast targets (mappers/types.py:19-24): int→int64,
    * float→float32 (we use float64 — SQL-friendlier), bool, str. */
  def parse(t: String): DataType = t match {
    case "int"    => LongType
    case "float"  => DoubleType
    case "bool"   => BooleanType
    case "str"    => StringType
    case other    => org.apache.spark.sql.types.DataType.fromDDL(other)
  }

  /** Rebuild a (possibly nested) type with leaves replaced by `target`,
    * mirroring the reference's recursive cast (mappers/types.py:27-40). */
  def recast(dt: DataType, target: DataType): DataType = dt match {
    case ArrayType(e, n) => ArrayType(recast(e, target), n)
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = recast(f.dataType, target))))
    case MapType(k, v, n) => MapType(k, recast(v, target), n)
    case _                => target
  }
}

/** Cast listed fields to a target type, recursing into arrays/structs.
  * Ref: mappers/types.py:43-161. Note: Python `int()` truncates toward
  * zero, which matches Spark's (non-ANSI) fractional→integral cast.
  * Arrays are cast element-wise via `transform` (Spark 4 rejects some
  * whole-array casts, e.g. array<double>→array<bigint>). */
final case class Cast(castMap: Map[String, String]) extends Mapper {
  override def inputFields: Seq[String] = castMap.keys.toSeq
  override def outputFields: Seq[String] = castMap.keys.toSeq

  private def recastCol(c: Column, dt: DataType, target: DataType): Column =
    dt match {
      case ArrayType(e, _) => transform(c, x => recastCol(x, e, target))
      case StructType(fs) =>
        struct(fs.toIndexedSeq.map(f =>
          recastCol(c.getField(f.name), f.dataType, target).as(f.name)): _*)
      case _ => c.cast(target)
    }

  override protected def build(df: DataFrame): DataFrame =
    castMap.foldLeft(df) { case (acc, (f, t)) =>
      val target = CastTypes.parse(t)
      acc.withColumn(f, recastCol(col(f), acc.schema(f).dataType, target))
    }
}

/** `int(value > threshold)`, recursively through arrays.
  * Ref: mappers/types.py:164-179. */
final case class Binarizer(field: String, threshold: Double) extends Mapper {
  override def inputFields: Seq[String] = Seq(field)
  override def outputFields: Seq[String] = Seq(field)
  override protected def build(df: DataFrame): DataFrame = {
    def bin(c: Column, dt: DataType): Column = dt match {
      case ArrayType(e, _) => transform_(c, x => bin(x, e))
      case _ => when(c > lit(threshold), lit(1L)).otherwise(lit(0L))
    }
    df.withColumn(field, bin(col(field), df.schema(field).dataType))
  }
  private def transform_(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.transform(c, f)
}

/** Map values through a finite dict. Small tables become a literal
  * `map(...)` + `element_at` (codegen'd, no shuffle); missing keys yield
  * null rather than the reference's KeyError (mappers/types.py:182-203). */
final case class Lookup(fieldName: String, lookupTable: Map[Any, Any])
    extends Mapper {
  require(
    lookupTable.keys.map(_.getClass).toSet.size <= 1,
    "Lookup source values must be of the same type"
  )
  require(
    lookupTable.values.map(_.getClass).toSet.size <= 1,
    "Lookup target values must be of the same type"
  )
  override def inputFields: Seq[String] = Seq(fieldName)
  override def outputFields: Seq[String] = Seq(fieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val entries = lookupTable.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v))
    }
    df.withColumn(fieldName, element_at(map(entries: _*), col(fieldName)))
  }
}

/** int label → one-hot List[int] of length numClasses.
  * Ref: mappers/types.py:206-222. */
final case class OneHot(numClasses: Int, fieldName: String) extends Mapper {
  override def inputFields: Seq[String] = Seq(fieldName)
  override def outputFields: Seq[String] = Seq(fieldName)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(
      fieldName,
      transform(
        sequence(lit(0L), lit(numClasses - 1L)),
        i => when(i === col(fieldName).cast(LongType), lit(1L)).otherwise(lit(0L))
      )
    )
}

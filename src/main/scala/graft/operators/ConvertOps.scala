package graft.operators

import graft.Mapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Boundary + debug mappers.
  * Ref: /root/reference/src/smashed/mappers/converters.py (Python2Torch /
  * Torch2Python) and /root/reference/src/smashed/mappers/debug.py.
  *
  * Tensor-ness is a format detail (SURVEY §2.8): the Spark-side analog of
  * Python2Torch is handing Arrow batches to the training framework. We
  * expose the per-field dtype cast (the part with dataflow semantics) as a
  * mapper and the Arrow hand-off as a terminal iterator.
  */

/** Per-field dtype cast for ML hand-off, mirroring Python2TorchMapper's
  * `field_cast_map` (converters.py:22-102). */
final case class FieldCast(fieldCastMap: Map[String, String]) extends Mapper {
  override def inputFields: Seq[String] = fieldCastMap.keys.toSeq
  override def outputFields: Seq[String] = fieldCastMap.keys.toSeq
  override protected def build(df: DataFrame): DataFrame =
    fieldCastMap.foldLeft(df) { case (acc, (f, t)) =>
      val target = CastTypes.parse(t)
      acc.withColumn(
        f,
        col(f).cast(CastTypes.recast(acc.schema(f).dataType, target))
      )
    }
}

object MlHandoff {
  /** Terminal boundary (the Python2Torch analog, converters.py:22-102):
    * stream rows to the training process one partition at a time — no
    * full-driver materialization. For a columnar hand-off, write parquet
    * (Arrow-compatible) and memory-map it from the trainer instead. */
  def toLocalRowIterator(df: DataFrame): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
}

/** Log/peek mapper (the breakpoint-free analog of DebugSingleMapper,
  * debug.py:8-35): shows `numRows` rows + the schema at plan build. */
final case class DebugPeek(numRows: Int = 5, label: String = "debug")
    extends Mapper {
  override protected def build(df: DataFrame): DataFrame = {
    // driver-side peek at build time; the plan itself is unchanged
    println(s"[$label] schema: ${df.schema.simpleString}")
    df.show(numRows, truncate = 60)
    df
  }
}

/** Test mapper: add a constant to every numeric value (MockMapper,
  * debug.py:56-72). */
final case class MockAdd(delta: Long = 1L) extends Mapper {
  override protected def build(df: DataFrame): DataFrame = {
    val outCols = df.schema.fields.map { f =>
      f.dataType match {
        case _: LongType | _: IntegerType | _: DoubleType | _: FloatType =>
          (col(f.name) + delta).cast(f.dataType).as(f.name)
        case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
          transform(col(f.name), x => (x + delta).cast(et)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(outCols.toSeq: _*)
  }
}

package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Collation: ragged → rectangular batches.
  * Ref: /root/reference/src/smashed/mappers/collators.py.
  *
  * Operates on batch rows (the output of [[FixedBatchSize]]): each listed
  * field is an array-of-sequences; every sequence is padded to the batch
  * max (or `padToLength` / the next multiple of `padToMultipleOf`).
  * Depth ≤ 2 covers every reference use (SURVEY §7.3); recursion over
  * deeper shapes unrolls at plan time from the schema.
  */
final case class ListCollator(
    fieldsPadIds: Map[String, Long],
    unkFieldsPadId: Option[Long] = None,
    padToLength: Option[Int] = None,
    padToMultipleOf: Option[Int] = None,
    leftPadFields: Seq[String] = Nil
) extends Mapper {
  // fieldsPadIds act as per-field defaults applied to whichever fields
  // are present (the FromTokenizer mixin relies on this, collators.py:
  // 112-159) — so presence is checked in build, not preflight.
  override def inputFields: Seq[String] = Nil
  override def outputFields: Seq[String] = fieldsPadIds.keys.toSeq

  private def padIdFor(f: String): Long =
    fieldsPadIds.getOrElse(
      f,
      unkFieldsPadId.getOrElse(
        throw new IllegalArgumentException(s"No pad id for field $f")
      )
    )

  override protected def build(df: DataFrame): DataFrame = {
    val targets = df.schema.fields
      .filter(f => fieldsPadIds.contains(f.name) ||
        (unkFieldsPadId.isDefined && f.dataType.isInstanceOf[ArrayType]))
      .map(_.name)
    require(
      targets.nonEmpty,
      s"ListCollator: none of [${fieldsPadIds.keys.mkString(", ")}] present " +
        s"in schema [${df.columns.mkString(", ")}]"
    )
    val outCols = df.columns.toSeq.map { c =>
      if (targets.contains(c)) padded(df, c).as(c) else col(c)
    }
    df.select(outCols: _*)
  }

  /** target length: max(seq len over batch, padToLength), rounded up to
    * padToMultipleOf. Ref collators.py:334-421. */
  private def targetLen(seqs: Column): Column = {
    val maxLen0 = coalesce(
      array_max(transform(seqs, s => size(s))),
      lit(0)
    )
    val maxLen = padToLength
      .map(n => greatest(lit(n), maxLen0))
      .getOrElse(maxLen0)
    padToMultipleOf match {
      case Some(m) => ceil(maxLen.cast(DoubleType) / m).cast(IntegerType) * m
      case None    => maxLen
    }
  }

  private def padded(df: DataFrame, field: String): Column = {
    val pad = lit(padIdFor(field))
    val left = leftPadFields.contains(field)
    df.schema(field).dataType match {
      // array<array<X>>: a batch of sequences — the standard shape
      case ArrayType(ArrayType(_, _), _) =>
        val tl = targetLen(col(field))
        transform(
          col(field),
          s => {
            val fill = array_repeat(pad, greatest(lit(0), tl - size(s)))
            if (left) concat(fill, s) else concat(s, fill)
          }
        )
      // array<X>: a single ragged sequence per row — pad to padToLength
      case ArrayType(_, _) =>
        val tl0 = padToLength
          .map(n => lit(n))
          .getOrElse(size(col(field)))
        val tl = padToMultipleOf match {
          case Some(m) => ceil(tl0.cast(DoubleType) / m).cast(IntegerType) * m
          case None    => tl0
        }
        val fill = array_repeat(pad, greatest(lit(0), tl - size(col(field))))
        if (left) concat(fill, col(field)) else concat(col(field), fill)
      case other =>
        throw new IllegalArgumentException(
          s"ListCollator: field $field has non-array type $other"
        )
    }
  }
}

object ListCollator {
  /** Pre-seed pad ids from a tokenizer, mirroring
    * FromTokenizerListCollatorMapper (collators.py:112-159): input_ids →
    * pad token id, attention_mask → 0, special_tokens_mask → 1. */
  def fromTokenizer(
      tokenizer: GraftTokenizer,
      extraFieldsPadIds: Map[String, Long] = Map.empty,
      padToLength: Option[Int] = None,
      padToMultipleOf: Option[Int] = None,
      leftPadFields: Seq[String] = Nil
  ): ListCollator =
    ListCollator(
      Map(
        "input_ids" -> tokenizer.padId,
        "attention_mask" -> 0L,
        "special_tokens_mask" -> 1L,
        "token_type_ids" -> 0L,
        "labels" -> -100L
      ) ++ extraFieldsPadIds,
      padToLength = padToLength,
      padToMultipleOf = padToMultipleOf,
      leftPadFields = leftPadFields
    )
}

/** Batch-layout planning for the collator: how much padding does a
  * batch-size / ordering choice cost? For fixed `batchSize`, per-batch
  * padding = n·max(len) − Σlen; `sortByLength = true` is the
  * dynamic-padding trick (sorted contiguous batching provably minimizes
  * Σ max over equal-size contiguous batches, hence total padding), and
  * comparing the two modes quantifies what length-bucketing buys before
  * anyone trains anything.
  *
  * Scale shape: global batch ids come from the sorted-`zipWithIndex`
  * pattern (range-partitioned sort → index preserves global order; never
  * an unpartitioned `row_number` window), then one partial-aggregated
  * groupBy on the dense batch id. Output is O(#batches) rows. */
object CollatorStats {

  def paddingWaste(
      df: DataFrame,
      idField: String,
      lenField: String,
      batchSize: Int,
      sortByLength: Boolean = true
  ): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = df.sparkSession
    val ordered =
      if (sortByLength) df.orderBy(col(lenField), col(idField))
      else df.orderBy(col(idField))
    val slim = ordered.select(col(lenField).cast(LongType).as("__cs_len"))
    val schema = StructType(
      slim.schema.fields :+ StructField("__cs_idx", LongType))
    val indexed = spark.createDataFrame(
      slim.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      },
      schema
    )
    indexed
      .withColumn("batch", expr(s"__cs_idx div ${batchSize}L"))
      .groupBy(col("batch"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("__cs_len")).as("max_len"),
        sum(col("__cs_len")).as("total_len")
      )
      .withColumn("padding",
        col("n_rows") * col("max_len") - col("total_len"))
  }
}

package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contrib mappers (SQuAD/SSE-style QA helpers).
  * Ref: /root/reference/src/smashed/contrib/squad.py,
  * /root/reference/src/smashed/contrib/sse.py.
  * All native Column expressions.
  */

/** Context (str | list | list-of-lists) → one document string with
  * BOS/EOS separators at section/paragraph/header/doc level.
  * Ref: contrib/squad.py:47-139. Depth is static from the schema, so the
  * three accepted shapes compile to three plans. */
final case class ConcatenateContext(
    contextField: String = "context",
    headerField: Option[String] = None,
    docBos: String = "",
    docEos: String = "",
    sectionBos: String = "",
    sectionEos: String = "\n",
    paragraphBos: String = "",
    paragraphEos: String = " ",
    headerBos: String = "",
    headerEos: String = "\n"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(contextField) ++ headerField
  override def outputFields: Seq[String] = Seq(contextField)

  override protected def build(df: DataFrame): DataFrame = {
    val c = col(contextField)
    val body: Column = df.schema(contextField).dataType match {
      case StringType => c
      case ArrayType(StringType, _) =>
        // list of paragraphs
        concat_ws(
          "",
          transform(c, p => concat(lit(paragraphBos), p, lit(paragraphEos)))
        )
      case ArrayType(ArrayType(StringType, _), _) =>
        // sections of paragraphs; optional per-section headers
        val sections = headerField match {
          case Some(h) =>
            transform(
              arrays_zip(col(h), c),
              z =>
                concat(
                  lit(sectionBos),
                  lit(headerBos),
                  z.getField(h),
                  lit(headerEos),
                  concat_ws(
                    "",
                    transform(
                      z.getField(contextField),
                      p => concat(lit(paragraphBos), p, lit(paragraphEos))
                    )
                  ),
                  lit(sectionEos)
                )
            )
          case None =>
            transform(
              c,
              sec =>
                concat(
                  lit(sectionBos),
                  concat_ws(
                    "",
                    transform(sec, p => concat(lit(paragraphBos), p, lit(paragraphEos)))
                  ),
                  lit(sectionEos)
                )
            )
        }
        concat_ws("", sections)
      case other =>
        throw new IllegalArgumentException(
          s"ConcatenateContext: unsupported type $other for $contextField"
        )
    }
    df.withColumn(contextField, concat(lit(docBos), body, lit(docEos)))
  }
}

/** Order-preserving dedup of a list field. Ref: contrib/squad.py:142-158.
  * Spark's `array_distinct` preserves first-appearance order. */
final case class UniqueAnswer(field: String = "answers") extends Mapper {
  override def inputFields: Seq[String] = Seq(field)
  override def outputFields: Seq[String] = Seq(field)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(field, array_distinct(col(field)))
}

/** For each evidence string, locate it in the context: `(start, end)` char
  * span, or (-1, -1) when absent. Ref: contrib/squad.py:161-195.
  * `instr` is 1-based (0 = not found). */
final case class AddEvidencesLocation(
    contextField: String = "context",
    evidencesField: String = "evidences",
    locationsField: String = "locations"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(contextField, evidencesField)
  override def outputFields: Seq[String] = Seq(locationsField)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(
      locationsField,
      transform(
        col(evidencesField),
        e => {
          val posn = instr(col(contextField), e)
          when(posn > 0, array(posn.cast(LongType) - 1,
            posn.cast(LongType) - 1 + length(e)))
            .otherwise(array(lit(-1L), lit(-1L)))
        }
      )
    )
}

/** Shift CHAR-level evidence spans into TOKEN-level spans using the
  * offset mapping produced by [[EncodeFields]] on the context field.
  * Ref: contrib/squad.py:198-262 — the reference bisects the encoder's
  * (start, end) offsets; here the bisects become counting filters over
  * the offsets array:
  *   token start = start offset of the last token whose start ≤ s;
  *   token end   = end offset of the first token whose end ≥ e.
  * Spans with start/end ≤ 0 stay -1 (absent evidence). */
final case class ShiftEvidenceLocations(
    offsetsField: String,
    locationField: String = "locations"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(offsetsField, locationField)
  override def outputFields: Seq[String] = Seq(locationField)
  override protected def build(df: DataFrame): DataFrame = {
    val offs = col(offsetsField)
    df.withColumn(
      locationField,
      transform(
        col(locationField),
        loc => {
          val s = element_at(loc, 1)
          val e = element_at(loc, 2)
          val posR = size(filter(offs, o => element_at(o, 1) <= s)) // bisect_right
          val posL = size(filter(offs, o => element_at(o, 2) < e))  // bisect_left
          val newStart =
            when(s > 0, element_at(element_at(offs, posR), 1)).otherwise(lit(-1L))
          val newEnd =
            when(e > 0, element_at(element_at(offs, posL + 1), 2)).otherwise(lit(-1L))
          array(newStart, newEnd)
        }
      )
    )
  }
}

/** Convenience wrapper: stride context + locations (+ extra fields)
  * together. Ref: contrib/squad.py:265-284 (a field-union shim over
  * SingleSequenceStrider). */
object StriderWithEvidenceLocation {
  def apply(
      maxLength: Int,
      contextField: String = "context",
      locationField: String = "locations",
      fieldsToStride: Seq[String] = Nil,
      stride: Option[Int] = None,
      keepLast: Boolean = false
  ): SingleSequenceStrider =
    SingleSequenceStrider(
      (Set(contextField, locationField) ++ fieldsToStride).toSeq.sorted,
      maxLength,
      stride,
      keepLast
    )
}

/** When a window contains NO evidence (location mask sums to 0), replace
  * the target labels with a canned encoded prompt (e.g. the token ids of
  * "no evidence"). Ref: contrib/squad.py:286-316. */
final case class ReplaceIfNoEvidence(
    locationField: String = "locations",
    targetField: String = "labels",
    replacementIds: Seq[Long]
) extends Mapper {
  override def inputFields: Seq[String] = Seq(locationField, targetField)
  override def outputFields: Seq[String] = Seq(targetField)
  override protected def build(df: DataFrame): DataFrame = {
    val locSum = aggregate(col(locationField), lit(0L), (a, x) => a + x)
    df.withColumn(
      targetField,
      when(locSum > 0, col(targetField))
        .otherwise(SeqUtil.litArray(replacementIds))
    )
  }
}

/** Split an annotations array: position `pos` → `preds`, mean of the rest
  * → `label`. Ref: contrib/sse.py:5-38. */
final case class OneVsOtherAnnotator(
    annotationsField: String = "annotations",
    position: Int = 0,
    predsField: String = "preds",
    labelField: String = "label"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(annotationsField)
  override def outputFields: Seq[String] = Seq(predsField, labelField)
  override protected def build(df: DataFrame): DataFrame = {
    val c = col(annotationsField)
    val others = concat(
      slice(c, lit(1), lit(position)),
      slice(c, lit(position + 2), greatest(lit(0), size(c) - position - 1))
    )
    df.withColumn(predsField, element_at(c, position + 1))
      .withColumn(
        labelField,
        aggregate(others, lit(0.0), (acc, x) => acc + x.cast(DoubleType)) /
          size(others).cast(DoubleType)
      )
  }
}

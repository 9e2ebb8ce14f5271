package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Prompt templating in text and token-id space.
  * Ref: /root/reference/src/smashed/mappers/prompting.py:338-555.
  * Templates are parsed ONCE on the driver (like the reference's
  * `string.Formatter` parse); filling compiles to a `concat` of literals
  * and columns — fully codegen'd, constant-folded by Catalyst.
  */

/** One parsed segment: literal text followed by an optional field ref.
  * Ref: prompting.py:338-425. */
final case class PromptSegment(
    promptText: String,
    fieldName: Option[String]
)

object PromptSegment {
  /** Parse "{a} is a {b}." into segments, python `string.Formatter`
    * style. Supports `{{`/`}}` escapes. */
  def fromTemplate(template: String): List[PromptSegment] = {
    val out = scala.collection.mutable.ListBuffer.empty[PromptSegment]
    val lit = new StringBuilder
    var i = 0
    val n = template.length
    while (i < n) {
      val c = template.charAt(i)
      if (c == '{' && i + 1 < n && template.charAt(i + 1) == '{') {
        lit += '{'; i += 2
      } else if (c == '}' && i + 1 < n && template.charAt(i + 1) == '}') {
        lit += '}'; i += 2
      } else if (c == '{') {
        val close = template.indexOf('}', i)
        require(close >= 0, s"Unbalanced '{' in template: $template")
        val field = template.substring(i + 1, close)
        out += PromptSegment(lit.result(), Some(field))
        lit.clear()
        i = close + 1
      } else {
        lit += c; i += 1
      }
    }
    if (lit.nonEmpty) out += PromptSegment(lit.result(), None)
    out.toList
  }
}

/** Fill a text prompt template: "{a} is {b}" → concat(lit, col, …).
  * Ref: prompting.py:428-444. */
final case class FillTextPrompt(
    promptTemplate: String,
    outputFieldName: String
) extends Mapper {
  private val segments = PromptSegment.fromTemplate(promptTemplate)
  override def inputFields: Seq[String] = segments.flatMap(_.fieldName)
  override def outputFields: Seq[String] = Seq(outputFieldName)
  override protected def build(df: DataFrame): DataFrame = {
    val parts: Seq[Column] = segments.flatMap { s =>
      val l = if (s.promptText.nonEmpty) Seq(lit(s.promptText)) else Nil
      l ++ s.fieldName.map(f => col(f).cast(StringType)).toSeq
    }
    val c = if (parts.isEmpty) lit("") else concat(parts: _*)
    df.withColumn(outputFieldName, c)
  }
}

/** Fill a prompt in token-id space: literals are pre-tokenized on the
  * driver (via `tokenizeLiteral`), fields are already-encoded id arrays;
  * the result is one concat of constant arrays and columns.
  * Ref: prompting.py:447-555. */
final case class FillEncodedPrompt(
    template: String,
    tokenizeLiteral: String => Seq[Long],
    bosTokenIds: Seq[Long] = Nil,
    eosTokenIds: Seq[Long] = Nil,
    outputPrefix: Option[String] = None,
    outputRenameMap: Map[String, String] = Map.empty,
    returnAttentionMask: Boolean = true,
    returnTokenTypeIds: Boolean = false
) extends Mapper {
  require(
    outputPrefix.isEmpty || outputRenameMap.isEmpty,
    "You cannot specify both outputPrefix and outputRenameMap."
  )
  private val segments = PromptSegment.fromTemplate(template)
  private def fname(f: String): String =
    outputPrefix.map(p => s"${p}_$f").getOrElse(outputRenameMap.getOrElse(f, f))
  override def inputFields: Seq[String] = segments.flatMap(_.fieldName)
  override def outputFields: Seq[String] =
    Seq(fname("input_ids")) ++
      (if (returnAttentionMask) Seq(fname("attention_mask")) else Nil) ++
      (if (returnTokenTypeIds) Seq(fname("token_type_ids")) else Nil)

  override protected def build(df: DataFrame): DataFrame = {
    import SeqUtil.litArray
    val parts: Seq[Column] =
      Seq(litArray(bosTokenIds)) ++
        segments.flatMap { s =>
          val ids = tokenizeLiteral(s.promptText)
          Seq(litArray(ids)) ++
            s.fieldName.map(f => col(f).cast(ArrayType(LongType))).toSeq
        } ++ Seq(litArray(eosTokenIds))
    val ids = concat(parts: _*)
    var out = df.withColumn(fname("input_ids"), ids)
    if (returnAttentionMask)
      out = out.withColumn(
        fname("attention_mask"),
        array_repeat(lit(1L), size(col(fname("input_ids"))))
      )
    if (returnTokenTypeIds)
      out = out.withColumn(
        fname("token_type_ids"),
        array_repeat(lit(0L), size(col(fname("input_ids"))))
      )
    out
  }
}

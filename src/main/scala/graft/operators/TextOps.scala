package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text scalar mappers.
  * Ref: /root/reference/src/smashed/mappers/text.py and
  * /root/reference/src/smashed/utils/wordsplitter.py:26-96.
  * All splitters compile to codegen'd regex expressions — no UDFs.
  */

object Splitters {
  /** `ws`  — WhitespaceSplit pre-tokenizer: split on runs of whitespace. */
  val Ws = "ws"
  /** `plus` — Whitespace pre-tokenizer: `\w+|[^\w\s]+`. */
  val Plus = "plus"
  /** `trail` — like `plus` but each token keeps its trailing whitespace
    * (wordsplitter.py:84-96). */
  val Trail = "trail"

  def toColumn(c: Column, splitter: String): Column = splitter match {
    case Ws    => filter(split(c, "\\s+"), w => w =!= lit(""))
    case Plus  => regexp_extract_all(c, lit("\\w+|[^\\w\\s]+"), lit(0))
    case Trail => regexp_extract_all(c, lit("(?:\\w+|[^\\w\\s]+)\\s*"), lit(0))
    case other => throw new IllegalArgumentException(s"Unknown splitter: $other")
  }
}

/** Split text fields into word arrays. Ref: text.py:67-93. Accepts string
  * columns or array-of-string columns (reference handles both,
  * wordsplitter.py:33-39). */
final case class TextToWords(fields: Seq[String], splitter: String = "plus")
    extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  override protected def build(df: DataFrame): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      val c = acc.schema(f).dataType match {
        case ArrayType(StringType, _) =>
          transform(col(f), x => Splitters.toColumn(x, splitter))
        case StringType => Splitters.toColumn(col(f), splitter)
        case other =>
          throw new IllegalArgumentException(
            s"TextToWords: field $f has type $other, expected string"
          )
      }
      acc.withColumn(f, c)
    }
}

/** Join word arrays back to text (or list-of-word-lists to list of texts).
  * Ref: text.py:96-114. */
final case class WordsToText(fields: Seq[String], joiner: String = " ")
    extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  override protected def build(df: DataFrame): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      val c = acc.schema(f).dataType match {
        case ArrayType(ArrayType(StringType, _), _) =>
          transform(col(f), x => array_join(x, joiner))
        case ArrayType(StringType, _) => array_join(col(f), joiner)
        case other =>
          throw new IllegalArgumentException(
            s"WordsToText: field $f has type $other, expected array<string>"
          )
      }
      acc.withColumn(f, c)
    }
}

/** Replace tokens made entirely of the given Unicode categories with
  * `replaceToken`. Ref: tokenize.py:232-271. Java regex supports
  * `\p{Cc}`-style category classes natively; Python's
  * `all(category(ch) in cats for ch in token)` is vacuously true on the
  * empty token, hence `*` not `+` in the pattern. */
final case class ValidUnicode(
    fields: Seq[String],
    unicodeCategories: Seq[String],
    replaceToken: String
) extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  private def pattern: String =
    "^(?:" + unicodeCategories.map(c => s"\\p{$c}").mkString("|") + ")*$"
  override protected def build(df: DataFrame): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      acc.withColumn(
        f,
        transform(
          col(f),
          t => when(t.rlike(pattern), lit(replaceToken)).otherwise(t)
        )
      )
    }
}

/** Lightweight text fixer in the spirit of the reference's FtfyMapper
  * (text.py:16-64, which delegates to the ftfy library). We implement the
  * high-value fixes on the JVM with built-in tools only: Unicode NFC
  * normalization, common UTF-8-decoded-as-Latin-1 mojibake repair, HTML
  * entity unescape for the frequent few, and control-char stripping. */
final case class FixText(fields: Seq[String]) extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  override protected def build(df: DataFrame): DataFrame = {
    val fix = udf(FixText.fixText _)
    fields.foldLeft(df)((acc, f) => acc.withColumn(f, fix(col(f))))
  }
}

object FixText {
  private val entities = Seq(
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " "
  )

  /** Heuristic: if a string contains characters typical of UTF-8 bytes
    * mis-decoded as Latin-1/Windows-1252 (e.g. "Ã©" for "é"), re-encode
    * through Latin-1 and decode as UTF-8; keep the result only if it
    * strictly reduces mojibake markers. */
  def fixText(s: String): String = {
    if (s == null) return null
    var t = s
    entities.foreach { case (k, v) => t = t.replace(k, v) }
    if (looksMojibake(t)) {
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val redecoded = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      if (!redecoded.contains('�') && mojibakeScore(redecoded) < mojibakeScore(t))
        t = redecoded
    }
    t = t.filter(ch => ch == '\n' || ch == '\t' || !Character.isISOControl(ch))
    java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
  }

  private def looksMojibake(s: String): Boolean = mojibakeScore(s) > 0
  private def mojibakeScore(s: String): Int =
    s.count(ch => (ch >= 'Â' && ch <= 'Ã') || ch == '€' ||
      ch == 'â' || ch == 'œ' || ch == '™')
}

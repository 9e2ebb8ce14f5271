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

/** Text fixer in the spirit of the reference's FtfyMapper (text.py:16-64,
  * which delegates to the ftfy library). JVM-built-ins-only implementation
  * of ftfy's default fix chain: HTML entity unescape (named + numeric),
  * line-break normalization, BOM removal, iterated Windows-1252 mojibake
  * repair guarded by a UTF-8-byte-pattern score (handles doubly-encoded
  * text like ftfy does), fullwidth→ASCII width fixing, quote uncurling,
  * control-char stripping, and NFC normalization. */
final case class FixText(fields: Seq[String]) extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  override protected def build(df: DataFrame): DataFrame = {
    val fix = udf(FixText.fixText _)
    fields.foldLeft(df)((acc, f) => acc.withColumn(f, fix(col(f))))
  }
}

object FixText {
  private val cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "'", "rsquo" -> "'", "ldquo" -> "\"", "rdquo" -> "\"",
    "copy" -> "©", "reg" -> "®", "trade" -> "™", "deg" -> "°",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "szlig" -> "ß", "ccedil" -> "ç"
  )
  private val entityRe = "&(#[xX]?[0-9a-fA-F]+|[a-zA-Z]+);".r

  private def unescapeEntities(s: String): String =
    if (!s.contains('&')) s
    else
      entityRe.replaceAllIn(s, m => {
        val body = m.group(1)
        val rep =
          try {
            if (body.startsWith("#x") || body.startsWith("#X"))
              new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
            else if (body.startsWith("#"))
              new String(Character.toChars(Integer.parseInt(body.drop(1))))
            else namedEntities.getOrElse(body, m.matched)
          } catch { case _: Exception => m.matched }
        scala.util.matching.Regex.quoteReplacement(rep)
      })

  // UTF-8-as-cp1252 pattern: a misdecoded multibyte char shows up as a
  // LEAD char (byte 0xC2-0xF4 through cp1252) followed by CONTINUATION
  // chars (bytes 0x80-0xBF through cp1252). Counting those ADJACENT
  // pairs is ftfy's core badness signal, minus the language model.
  private val leadChars: Set[Char] =
    (0xc2 to 0xf4).map(b => new String(Array(b.toByte), cp1252).charAt(0)).toSet
  private val contChars: Set[Char] =
    (0x80 to 0xbf).map(b => new String(Array(b.toByte), cp1252).charAt(0)).toSet

  private def mojibakeScore(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length - 1) {
      if (leadChars.contains(s.charAt(i)) && contChars.contains(s.charAt(i + 1)))
        n += 1
      i += 1
    }
    n
  }

  /** cp1252 re-encode + UTF-8 decode, or None if the string isn't fully
    * cp1252-representable / doesn't form valid UTF-8 (never corrupt). */
  private def tryRedecode(t: String): Option[String] = {
    if (!cp1252.newEncoder().canEncode(t)) return None
    val re = new String(t.getBytes(cp1252), utf8)
    if (re.contains('�')) None else Some(re)
  }

  private def fixWidthAndQuotes(s: String): String =
    s.map {
      case c if c >= '！' && c <= '～' => (c - 0xfee0).toChar // fullwidth
      case '　' => ' ' // ideographic space
      case '‘' | '’' | '‚' | '‛' => '\''
      case '“' | '”' | '„' | '‟' => '"'
      case c => c
    }

  def fixText(s: String): String = {
    if (s == null) return null
    var t = unescapeEntities(s)
    t = t.replace("\r\n", "\n").replace('\r', '\n')
      .replace(' ', '\n').replace(' ', '\n').replace('', '\n')
      .replace("﻿", "")
    // iterate like ftfy: doubly-encoded mojibake needs multiple passes
    var iter = 0
    var continue = mojibakeScore(t) > 0
    while (iter < 3 && continue) {
      tryRedecode(t) match {
        case Some(r) if mojibakeScore(r) < mojibakeScore(t) =>
          t = r
          iter += 1
          continue = mojibakeScore(t) > 0
        case _ => continue = false
      }
    }
    t = fixWidthAndQuotes(t)
    t = t.filter(ch => ch == '\n' || ch == '\t' || !Character.isISOControl(ch))
    java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
  }
}

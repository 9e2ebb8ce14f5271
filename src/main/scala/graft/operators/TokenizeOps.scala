package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tokenization — the reference's irreducible UDF surface
  * (/root/reference/src/smashed/mappers/tokenize.py:84-229,
  * /root/reference/src/smashed/mappers/prompting.py:36-148,
  * /root/reference/src/smashed/mappers/decoding.py:23-79).
  *
  * Design (SURVEY §2.7): the tokenizer is a driver-built, serializable
  * vocabulary object shipped to executors once per task (Spark closure
  * serialization ~ the reference's pickle-to-HF-worker boundary,
  * /root/reference/src/smashed/base/mappers.py:116-137). Tokenization runs
  * in a UDF whose captured tokenizer deserializes once per task — the
  * same amortization as mapPartitions; everything before/after stays
  * native Catalyst expressions.
  *
  * The bundled implementation is a faithful WordPiece (BERT-style):
  * basic tokenizer (whitespace split, punctuation split, lowercase,
  * accent-strip) + greedy longest-match-first subword split with "##"
  * continuations — the algorithm published with BERT and implemented in
  * HF tokenizers; no external code used.
  */

/** Minimal tokenizer contract (mirrors the slice of the HF interface the
  * reference actually uses: encode, decode, special ids, pad id). */
trait GraftTokenizer extends Serializable {
  def encode(text: String, addSpecialTokens: Boolean): Array[Long]

  /** id → token string (inverse vocab). */
  def decode(ids: Seq[Long], skipSpecialTokens: Boolean): String

  /** Subword pieces of `text` with per-piece char spans (id, start, end),
    * no specials. Offsets are SUBWORD-granular: each continuation piece
    * covers only its own characters (tokenize.py:84-229 offset_mapping). */
  def encodePieces(text: String): Array[(Long, Int, Int)]

  /** (token ids, per-token (startChar, endChar) offsets), no specials. */
  def encodeWithOffsets(text: String): (Array[Long], Array[(Int, Int)]) = {
    val p = encodePieces(text)
    (p.map(_._1), p.map(t => (t._2, t._3)))
  }

  /** `is_split_into_words` encoding: each element of `words` is one word;
    * all pieces concatenate into ONE sequence. Returns (ids, word index
    * per id, per-piece char span RELATIVE to its word) — the reference's
    * word_ids / offset_mapping semantics under is_split_into_words
    * (tokenize.py:95,102-103,193-224). */
  def encodeWords(words: Seq[String]): (Array[Long], Array[Int], Array[(Int, Int)]) = {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val wids = scala.collection.mutable.ArrayBuffer.empty[Int]
    val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var wi = 0
    words.foreach { w =>
      encodePieces(w).foreach { case (id, s, e) =>
        ids += id; wids += wi; offs += ((s, e))
      }
      wi += 1
    }
    (ids.toArray, wids.toArray, offs.toArray)
  }

  def bosIds: Seq[Long] // e.g. [CLS]
  def eosIds: Seq[Long] // e.g. [SEP]
  def sepIds: Seq[Long]
  def padId: Long
  def unkId: Long
}

/** BERT-style WordPiece over an explicit vocab (token → id).
  * `lowercase` mirrors bert-base-uncased's basic tokenizer. */
final case class WordPieceTokenizer(
    vocab: Map[String, Long],
    lowercase: Boolean = true,
    clsToken: String = "[CLS]",
    sepToken: String = "[SEP]",
    padToken: String = "[PAD]",
    unkToken: String = "[UNK]",
    maxInputCharsPerWord: Int = 100
) extends GraftTokenizer {

  private val inv: Map[Long, String] = vocab.map(_.swap)
  override val padId: Long = vocab.getOrElse(padToken, 0L)
  override val unkId: Long = vocab.getOrElse(unkToken, 100L)
  private val clsId: Long = vocab.getOrElse(clsToken, 101L)
  private val sepId: Long = vocab.getOrElse(sepToken, 102L)
  override def bosIds: Seq[Long] = Seq(clsId)
  override def eosIds: Seq[Long] = Seq(sepId)
  override def sepIds: Seq[Long] = Seq(sepId)

  private val specialTokens = Set(clsToken, sepToken, padToken, unkToken)

  /** Basic tokenization: split on whitespace, then split punctuation into
    * standalone tokens; track char offsets. */
  private def basicTokenize(text: String): Array[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (isPunct(c)) { out += ((text.substring(i, i + 1), i, i + 1)); i += 1 }
      else {
        var j = i
        while (j < n && !Character.isWhitespace(text.charAt(j)) &&
          !isPunct(text.charAt(j))) j += 1
        out += ((text.substring(i, j), i, j))
        i = j
      }
    }
    out.toArray
  }

  private def isPunct(c: Char): Boolean = {
    // BERT's definition: ASCII non-alphanumeric printables + Unicode P*
    val cp = c.toInt
    val asciiPunct = (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)
    val unicodePunct = Character.getType(c) match {
      case Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
          Character.START_PUNCTUATION | Character.END_PUNCTUATION |
          Character.INITIAL_QUOTE_PUNCTUATION |
          Character.FINAL_QUOTE_PUNCTUATION | Character.OTHER_PUNCTUATION =>
        true
      case _ => false
    }
    asciiPunct || unicodePunct
  }

  /** Per-char lowercase + NFD accent-strip (as bert-uncased does) with an
    * index map back to the original word: normalized char i originates
    * from original char map(i). Per-char lowercasing keeps the map exact
    * (whole-string toLowerCase may change length for a few code points). */
  private def normalizeWithMap(w: String): (String, Array[Int]) = {
    val sb = new java.lang.StringBuilder(w.length)
    val map = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < w.length) {
      val c = if (lowercase) Character.toLowerCase(w.charAt(i)) else w.charAt(i)
      val nfd = java.text.Normalizer
        .normalize(String.valueOf(c), java.text.Normalizer.Form.NFD)
      var j = 0
      while (j < nfd.length) {
        val ch = nfd.charAt(j)
        if (Character.getType(ch) != Character.NON_SPACING_MARK) {
          sb.append(ch); map += i
        }
        j += 1
      }
      i += 1
    }
    (sb.toString, map.toArray)
  }

  /** Two tries (word-initial and "##"-continuation pieces) make the
    * greedy longest-match scan O(L) probes per position with ZERO
    * substring allocation — the hot path of the one irreducible UDF.
    * Built lazily per JVM (@transient) after closure deserialization. */
  @transient private lazy val rootTrie: WordPieceTokenizer.TrieNode =
    WordPieceTokenizer.buildTrie(vocab, continuation = false)
  @transient private lazy val contTrie: WordPieceTokenizer.TrieNode =
    WordPieceTokenizer.buildTrie(vocab, continuation = true)

  /** Greedy longest-match-first WordPiece split of one (normalized) word,
    * with the char bounds of each piece within the word. */
  private def wordpieceBounds(word: String): Array[(Long, Int, Int)] = {
    val n = word.length
    if (n == 0) return Array.empty
    if (n > maxInputCharsPerWord) return Array((unkId, 0, n))
    val pieces = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var start = 0
    while (start < n) {
      var node = if (start == 0) rootTrie else contTrie
      var i = start
      var found = -1L
      var foundEnd = -1
      while (i < n && node != null) {
        node = node.child(word.charAt(i))
        i += 1
        if (node != null && node.id >= 0) { found = node.id; foundEnd = i }
      }
      if (found < 0) return Array((unkId, 0, n)) // whole word becomes UNK
      pieces += ((found, start, foundEnd))
      start = foundEnd
    }
    pieces.toArray
  }

  override def encodePieces(text: String): Array[(Long, Int, Int)] =
    basicTokenize(text).flatMap { case (w, s, e) =>
      if (specialTokens.contains(w)) Array((vocab(w), s, e))
      else {
        val (norm, map) = normalizeWithMap(w)
        // map piece bounds from normalized space back to original chars
        wordpieceBounds(norm).map { case (id, a, b) =>
          val so = if (a < map.length) s + map(a) else e
          val eo = if (b > 0 && b - 1 < map.length) s + map(b - 1) + 1 else e
          (id, so, eo)
        }
      }
    }

  override def encode(text: String, addSpecialTokens: Boolean): Array[Long] = {
    val body = encodePieces(text).map(_._1)
    if (addSpecialTokens) clsId +: body :+ sepId else body
  }

  override def decode(ids: Seq[Long], skipSpecialTokens: Boolean): String = {
    val toks = ids.flatMap { id =>
      inv.get(id) match {
        case Some(t) if skipSpecialTokens && specialTokens.contains(t) => None
        case Some(t) => Some(t)
        case None    => Some(unkToken)
      }
    }
    val sb = new StringBuilder
    toks.foreach { t =>
      if (t.startsWith("##")) sb.append(t.drop(2))
      else {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(t)
      }
    }
    // HF-style clean_up_tokenization_spaces: detach the space the
    // word-joining pass put before punctuation/contractions
    sb.result()
      .replace(" .", ".").replace(" ?", "?").replace(" !", "!")
      .replace(" ,", ",").replace(" ' ", "' ").replace(" n't", "n't")
      .replace(" 'm", "'m").replace(" 's", "'s").replace(" 've", "'ve")
      .replace(" 're", "'re")
  }
}

object WordPieceTokenizer {

  /** Sparse char trie; `id` >= 0 marks a vocab piece ending here. */
  final class TrieNode {
    var id: Long = -1L
    private var keys: Array[Char] = Array.empty
    private var kids: Array[TrieNode] = Array.empty
    def child(c: Char): TrieNode = {
      var i = 0
      while (i < keys.length) {
        if (keys(i) == c) return kids(i)
        i += 1
      }
      null
    }
    def childOrAdd(c: Char): TrieNode = {
      val existing = child(c)
      if (existing != null) existing
      else {
        val n = new TrieNode
        keys = keys :+ c
        kids = kids :+ n
        n
      }
    }
  }

  private[operators] def buildTrie(
      vocab: Map[String, Long],
      continuation: Boolean
  ): TrieNode = {
    val root = new TrieNode
    vocab.foreach { case (tok, id) =>
      val isCont = tok.startsWith("##")
      if (isCont == continuation) {
        val body = if (isCont) tok.drop(2) else tok
        if (body.nonEmpty) {
          var node = root
          body.foreach(c => node = node.childOrAdd(c))
          node.id = id
        }
      }
    }
    root
  }

  /** Build from a BERT-format vocab.txt (one token per line, id = line
    * number) — the public file format, no HF code involved. */
  def fromVocabFile(path: String, lowercase: Boolean = true): WordPieceTokenizer = {
    val lines = scala.io.Source.fromFile(path, "UTF-8")
    try WordPieceTokenizer(
      lines.getLines().zipWithIndex.map { case (t, i) => (t, i.toLong) }.toMap,
      lowercase
    )
    finally lines.close()
  }
}

/** Run the tokenizer over a text field; emits `<prefix>input_ids` and
  * optionally attention_mask / token_type_ids / special_tokens_mask /
  * offset_mapping / length / word_ids / words.
  * Ref: tokenize.py:28-229. Truncation to `maxLength` happens before
  * special tokens are counted, like HF's `truncation=True`.
  *
  * Output naming mirrors the reference mixin (tokenize.py:28-81): either
  * an `outputPrefix` ("<prefix>_<field>") or an `outputRenameMap` (every
  * emitted field must have an entry), never both.
  *
  * `isSplitIntoWords` treats an array<string> input as the WORDS of one
  * sequence (tokenize.py:95,193-224): pieces concatenate into a single
  * input_ids, `word_ids` gives each token's source-word index (null on
  * special tokens), `words` the source word itself. Without it, an
  * array<string> input is the batched-sentences shape (one encoding per
  * element).
  *
  * Scale: the vocab Map serializes once into the task closure; work is
  * a narrow mapPartitions (no shuffle). This is the one deliberate
  * codegen barrier in the engine (SURVEY §4.2). */
final case class TokenizerMapper(
    tokenizer: GraftTokenizer,
    inputField: String,
    outputPrefix: Option[String] = None,
    addSpecialTokens: Boolean = true,
    maxLength: Option[Int] = None,
    truncation: Boolean = false,
    returnAttentionMask: Boolean = true,
    returnSpecialTokensMask: Boolean = false,
    returnLength: Boolean = false,
    returnOverflowingTokens: Boolean = false,
    strideOverlap: Int = 0,
    returnTokenTypeIds: Boolean = false,
    returnOffsetsMapping: Boolean = false,
    isSplitIntoWords: Boolean = false,
    returnWordIds: Boolean = false,
    returnWords: Boolean = false,
    outputRenameMap: Option[Map[String, String]] = None
) extends Mapper {
  require(outputPrefix.isEmpty || outputRenameMap.isEmpty,
    "You cannot specify both outputPrefix and outputRenameMap.")
  require(!returnWordIds || isSplitIntoWords,
    "returnWordIds requires isSplitIntoWords (the word index is defined " +
      "against the input word list, tokenize.py:178-190)")
  require(!returnWords || returnWordIds,
    "returnWords requires returnWordIds (tokenize.py:179-184)")
  require(!(returnOffsetsMapping && returnOverflowingTokens),
    "offset_mapping with return_overflowing_tokens is not supported")

  private def fname(f: String): String = outputPrefix match {
    case Some(p) => s"${p}_$f"
    case None =>
      outputRenameMap match {
        case Some(m) =>
          m.getOrElse(f,
            throw new IllegalArgumentException(
              s"Field '$f' is not in the rename map."))
        case None => f
      }
  }

  override def inputFields: Seq[String] = Seq(inputField)
  // canonical order mirrors output_fields_from_tokenizer_kwargs
  // (tokenize.py:47-68) + word_ids/words appended (tokenize.py:178-184)
  override def outputFields: Seq[String] =
    (Seq("input_ids") ++
      (if (returnAttentionMask) Seq("attention_mask") else Nil) ++
      (if (returnTokenTypeIds) Seq("token_type_ids") else Nil) ++
      (if (returnOverflowingTokens) Seq("overflow_to_sample_mapping") else Nil) ++
      (if (returnSpecialTokensMask) Seq("special_tokens_mask") else Nil) ++
      (if (returnOffsetsMapping) Seq("offset_mapping") else Nil) ++
      (if (returnLength) Seq("length") else Nil) ++
      (if (returnWordIds) Seq("word_ids") else Nil) ++
      (if (returnWords) Seq("words") else Nil)).map(fname)

  override protected def build(df: DataFrame): DataFrame = {
    val tok = tokenizer
    val addSpecials = addSpecialTokens
    val maxLen = maxLength
    val trunc = truncation
    val nSpecial =
      if (addSpecials) tok.bosIds.size + tok.eosIds.size else 0

    val encodeUdf = udf { (text: String) =>
      if (text == null) null
      else {
        val body = tok.encode(text, addSpecialTokens = false)
        val kept = (maxLen, trunc) match {
          case (Some(m), true) => body.take(math.max(0, m - nSpecial))
          case _               => body
        }
        if (addSpecials) (tok.bosIds ++ kept ++ tok.eosIds).toArray
        else kept
      }
    }
    // HF-style overflow (tokenize.py return_overflowing_tokens): instead
    // of truncating, emit one row per maxLength-nSpecial window (with
    // strideOverlap overlap); overflow_to_sample_mapping carries the
    // source row index within this micro-batch semantics — we use a
    // window ordinal per input row (0,1,2,…), which is the stable,
    // distributable analog.
    val overflowUdf = udf { (text: String) =>
      if (text == null) null
      else {
        val body = tok.encode(text, addSpecialTokens = false)
        val win = math.max(1, maxLen.getOrElse(Int.MaxValue) - nSpecial)
        val step = math.max(1, win - strideOverlap)
        val chunks =
          if (body.length <= win) Array(body)
          else (0 to (body.length - win + step - 1) / step)
            .map(k => body.slice(k * step, math.min(k * step + win, body.length)))
            .filter(_.nonEmpty)
            .toArray
        chunks.map { c =>
          if (addSpecials) (tok.bosIds ++ c ++ tok.eosIds).toArray else c
        }
      }
    }
    // array<string> input: tokenize each element (the reference's
    // batched-sentences shape, README.md:33-75) → array<array<bigint>>
    val encodeManyUdf = udf { (texts: Seq[String]) =>
      if (texts == null) null
      else texts.map { t =>
        val body = tok.encode(t, addSpecialTokens = false)
        val kept = (maxLen, trunc) match {
          case (Some(m), true) => body.take(math.max(0, m - nSpecial))
          case _               => body
        }
        if (addSpecials) (tok.bosIds ++ kept ++ tok.eosIds).toArray else kept
      }
    }
    val isArrayInput =
      df.schema(inputField).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
    var out =
      if (isArrayInput) {
        require(!returnOverflowingTokens,
          "returnOverflowingTokens is not defined for array<string> input")
        df.withColumn(fname("input_ids"), encodeManyUdf(col(inputField)))
      } else if (returnOverflowingTokens) {
        df.withColumn("__graft_chunks", overflowUdf(col(inputField)))
          .select(
            col("*"),
            posexplode(col("__graft_chunks"))
              .as(Seq(fname("overflow_to_sample_mapping"), fname("input_ids")))
          )
          .drop("__graft_chunks")
          .withColumn(
            fname("overflow_to_sample_mapping"),
            col(fname("overflow_to_sample_mapping")).cast(LongType)
          )
      } else df.withColumn(fname("input_ids"), encodeUdf(col(inputField)))
    if (returnAttentionMask)
      out = out.withColumn(
        fname("attention_mask"),
        if (isArrayInput)
          transform(col(fname("input_ids")),
            s => transform(s, _ => lit(1L)))
        else
          transform(col(fname("input_ids")), _ => lit(1L))
      )
    if (returnSpecialTokensMask) {
      val nBos = tok.bosIds.size
      out = out.withColumn(
        fname("special_tokens_mask"),
        transform(
          col(fname("input_ids")),
          (_, i) =>
            when(
              lit(addSpecials) &&
                (i < nBos || i >= size(col(fname("input_ids"))) - tok.eosIds.size),
              lit(1L)
            ).otherwise(lit(0L))
        )
      )
    }
    if (returnLength)
      out = out.withColumn(
        fname("length"),
        size(col(fname("input_ids"))).cast(LongType)
      )
    out
  }
}

/** Tokenize N fields without special tokens; optional char-offset columns
  * `offset_<field>` for span alignment. Ref: prompting.py:36-148. */
final case class EncodeFields(
    fieldsToEncode: Seq[String],
    tokenizer: GraftTokenizer,
    fieldsToReturnOffsetMapping: Seq[String] = Nil,
    offsetPrefix: String = "offset"
) extends Mapper {
  override def inputFields: Seq[String] = fieldsToEncode
  override def outputFields: Seq[String] =
    fieldsToEncode ++ fieldsToReturnOffsetMapping.map(f => s"${offsetPrefix}_$f")

  override protected def build(df: DataFrame): DataFrame = {
    val tok = tokenizer
    val encodeUdf = udf { (text: String) =>
      if (text == null) null else tok.encode(text, addSpecialTokens = false)
    }
    val offsetsUdf = udf { (text: String) =>
      if (text == null) null
      else tok.encodeWithOffsets(text)._2.map { case (s, e) => Array(s.toLong, e.toLong) }
    }
    val withOffsets = fieldsToReturnOffsetMapping.foldLeft(df) { (acc, f) =>
      acc.withColumn(s"${offsetPrefix}_$f", offsetsUdf(col(f)))
    }
    fieldsToEncode.foldLeft(withOffsets) { (acc, f) =>
      acc.withColumn(f, encodeUdf(col(f)))
    }
  }
}

/** ids → text via inverse vocab. Ref: decoding.py:23-79. */
final case class Decoding(
    tokenizer: GraftTokenizer,
    fields: Seq[String] = Seq("input_ids"),
    skipSpecialTokens: Boolean = false
) extends Mapper {
  override def inputFields: Seq[String] = fields
  override def outputFields: Seq[String] = fields
  override protected def build(df: DataFrame): DataFrame = {
    val tok = tokenizer
    val skip = skipSpecialTokens
    val decodeUdf = udf { (ids: Seq[Long]) =>
      if (ids == null) null else tok.decode(ids, skip)
    }
    fields.foldLeft(df)((acc, f) => acc.withColumn(f, decodeUdf(col(f))))
  }
}

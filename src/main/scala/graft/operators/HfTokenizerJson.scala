package graft.operators

import com.fasterxml.jackson.databind.JsonNode

/** Loader for the HF fast-tokenizer single-file `tokenizer.json` format
  * (the public huggingface/tokenizers serialization most modern models
  * ship), feeding the existing JVM engines: `model.type` dispatches to
  * [[WordPieceTokenizer]], [[BytePairTokenizer]] or [[UnigramTokenizer]].
  *
  * Ref: the reference accepts any HF tokenizer object
  * (/root/reference/src/smashed/mappers/tokenize.py:84-229), which HF
  * constructs from this file via `AutoTokenizer.from_pretrained`; this
  * loader covers the file format itself so no HF code is involved.
  *
  * Honored config:
  *  - `model`: WordPiece (vocab, unk_token, continuing_subword_prefix,
  *    max_input_chars_per_word), BPE (vocab + merges in both public
  *    layouts — `"a b"` strings and `["a","b"]` pairs), Unigram
  *    (positional `[piece, score]` vocab + unk_id).
  *  - `normalizer`: BertNormalizer.lowercase / Lowercase (possibly
  *    inside a Sequence) set the WordPiece lowercase flag.
  *  - `added_tokens`: special entries extend/override the vocab and
  *    register as specials (BPE) or claim the special-id slots
  *    (Unigram: <pad>/<s>/</s>/<unk> by content).
  *  - `post_processor`: TemplateProcessing / BertProcessing single-
  *    sequence template picks the WordPiece cls/sep token names.
  *
  * Anything else (truncation/padding blocks, exotic model types) is
  * rejected fast on the driver with a clear error, mirroring the
  * repo-wide partial-depth contract. */
object HfTokenizerJson {

  def load(path: String): GraftTokenizer = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    val model = Option(root.get("model")).getOrElse(
      throw new IllegalArgumentException(s"$path: no `model` object"))
    val modelType =
      Option(model.get("type")).map(_.asText()).getOrElse("missing")
    modelType match {
      case "WordPiece" => loadWordPiece(root, model, path)
      case "BPE"       => loadBpe(root, model, path)
      case "Unigram"   => loadUnigram(root, model, path)
      case other =>
        throw new IllegalArgumentException(
          s"$path: unsupported model.type `$other` " +
            "(supported: WordPiece, BPE, Unigram)")
    }
  }

  /** added_tokens entries as (content, id, special). */
  private def addedTokens(root: JsonNode): Seq[(String, Long, Boolean)] =
    Option(root.get("added_tokens")).toSeq.flatMap { arr =>
      (0 until arr.size).map { i =>
        val t = arr.get(i)
        (t.get("content").asText(), t.get("id").asLong(),
          Option(t.get("special")).exists(_.asBoolean()))
      }
    }

  /** Lowercase flag from the normalizer config (BertNormalizer /
    * Lowercase, possibly nested in a Sequence). */
  private def lowercaseOf(root: JsonNode): Boolean = {
    def check(n: JsonNode): Boolean =
      Option(n.get("type")).map(_.asText()) match {
        case Some("BertNormalizer") =>
          Option(n.get("lowercase")).forall(_.asBoolean())
        case Some("Lowercase") => true
        case Some("Sequence") =>
          Option(n.get("normalizers")).exists(ns =>
            (0 until ns.size).exists(i => check(ns.get(i))))
        case _ => false
      }
    Option(root.get("normalizer")).filterNot(_.isNull).exists(check)
  }

  /** (clsToken, sepToken) from the post_processor's single-sequence
    * template: the SpecialToken before the `A` sequence and the first
    * one after it. */
  private def clsSepOf(root: JsonNode): Option[(String, String)] =
    Option(root.get("post_processor")).filterNot(_.isNull).flatMap { pp =>
      Option(pp.get("type")).map(_.asText()) match {
        case Some("TemplateProcessing") =>
          Option(pp.get("single")).flatMap { single =>
            var cls: Option[String] = None
            var sep: Option[String] = None
            var seenA = false
            (0 until single.size).foreach { i =>
              val item = single.get(i)
              if (item.has("Sequence")) seenA = true
              else if (item.has("SpecialToken")) {
                val id = item.get("SpecialToken").get("id").asText()
                if (!seenA && cls.isEmpty) cls = Some(id)
                else if (seenA && sep.isEmpty) sep = Some(id)
              }
            }
            for (c <- cls; s <- sep) yield (c, s)
          }
        case Some("BertProcessing") =>
          // [["[SEP]", id], ["[CLS]", id]] pair fields
          for {
            sep <- Option(pp.get("sep")).map(_.get(0).asText())
            cls <- Option(pp.get("cls")).map(_.get(0).asText())
          } yield (cls, sep)
        case _ => None
      }
    }

  private def loadWordPiece(
      root: JsonNode, model: JsonNode, path: String): WordPieceTokenizer = {
    val prefix = Option(model.get("continuing_subword_prefix"))
      .map(_.asText()).getOrElse("##")
    require(prefix == "##",
      s"$path: continuing_subword_prefix `$prefix` unsupported (need ##)")
    val vocab = scala.collection.mutable.Map.empty[String, Long]
    model.get("vocab").properties().forEach { e =>
      vocab(e.getKey) = e.getValue.asLong()
    }
    addedTokens(root).foreach { case (tok, id, _) => vocab(tok) = id }
    val unk = Option(model.get("unk_token")).map(_.asText())
      .getOrElse("[UNK]")
    val (cls, sep) = clsSepOf(root).getOrElse(("[CLS]", "[SEP]"))
    val pad = addedTokens(root)
      .collectFirst { case (t, _, true) if t.toUpperCase
        .contains("PAD") => t }
      .getOrElse("[PAD]")
    WordPieceTokenizer(
      vocab.toMap,
      lowercase = lowercaseOf(root),
      clsToken = cls, sepToken = sep, padToken = pad, unkToken = unk,
      maxInputCharsPerWord = Option(model.get("max_input_chars_per_word"))
        .map(_.asInt()).getOrElse(100))
  }

  private def loadBpe(
      root: JsonNode, model: JsonNode, path: String): BytePairTokenizer = {
    val vocab = scala.collection.mutable.Map.empty[String, Long]
    model.get("vocab").properties().forEach { e =>
      vocab(e.getKey) = e.getValue.asLong()
    }
    val mergesNode = model.get("merges")
    val merges = (0 until mergesNode.size).map { i =>
      val m = mergesNode.get(i)
      val (a, b) =
        if (m.isArray) (m.get(0).asText(), m.get(1).asText())
        else {
          val parts = m.asText().split(" ", 2)
          (parts(0), parts(1))
        }
      (a, b) -> i
    }.toMap
    val added = addedTokens(root)
    added.foreach { case (tok, id, _) => vocab(tok) = id }
    val specials = added.collect { case (tok, id, true) => tok -> id }.toMap
    val eot = specials.keys.find(_ == "<|endoftext|>")
      .orElse(specials.keys.headOption).getOrElse("<|endoftext|>")
    BytePairTokenizer(vocab.toMap, merges, specials, eotToken = eot)
  }

  private def loadUnigram(
      root: JsonNode, model: JsonNode, path: String): UnigramTokenizer = {
    val vocabArr = model.get("vocab")
    val unkIdx = Option(model.get("unk_id")).map(_.asLong()).getOrElse(0L)
    val added = addedTokens(root).map { case (t, id, _) => t -> id }.toMap
    var pad, bos, eos = -1L
    val pieces = Map.newBuilder[String, (Long, Double)]
    (0 until vocabArr.size).foreach { i =>
      val entry = vocabArr.get(i)
      val piece = entry.get(0).asText()
      val score = entry.get(1).asDouble()
      piece match {
        case "<pad>"          => pad = i.toLong
        case "<s>"            => bos = i.toLong
        case "</s>"           => eos = i.toLong
        case _ if i.toLong == unkIdx => () // unk piece is the fallback
        case _                => pieces += (piece -> ((i.toLong, score)))
      }
    }
    // added specials may live outside the positional vocab
    pad = if (pad >= 0) pad else added.getOrElse("<pad>", -1L)
    bos = if (bos >= 0) bos else added.getOrElse("<s>", -1L)
    eos = if (eos >= 0) eos else added.getOrElse("</s>", -1L)
    var next = vocabArr.size.toLong
    def alloc(id: Long): Long =
      if (id >= 0) id else { val v = next; next += 1; v }
    UnigramTokenizer(pieces.result(),
      padId = alloc(pad), bosId = alloc(bos), eosId = alloc(eos),
      unkId = unkIdx)
  }
}

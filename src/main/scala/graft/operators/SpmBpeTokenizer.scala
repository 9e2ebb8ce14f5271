package graft.operators

/** SentencePiece-style BPE with BYTE FALLBACK — the engine behind the
  * Llama/Mistral-family `tokenizer.json` serialization (model.type=BPE
  * with `byte_fallback: true`): merges apply over the ▁-space-marked
  * UNICODE text (not GPT-2's byte-to-unicode alphabet), and a final
  * piece absent from the vocab decomposes into its UTF-8 bytes'
  * `<0xNN>` tokens instead of `<unk>` (sentencepiece byte fallback).
  *
  * Ref: the reference delegates these files to HF AutoTokenizer
  * (/root/reference/src/smashed/mappers/tokenize.py:84-229); this
  * engine implements the public serialization's semantics on the JVM.
  *
  * Space-marking (`Prepend ▁` / `Replace " "→▁`) arrives through the
  * loader's normalizer CHAIN ([[HfTokenizerJson.NormalizingTokenizer]])
  * — this engine consumes already-marked text and treats the whole
  * input as ONE merge word (the family's files carry no splitting
  * pre_tokenizer).
  *
  * Decode implements the family's standard decoder chain
  * (`Replace ▁→" "` + `ByteFallback` + `Fuse` + `Strip` one leading
  * space): runs of `<0xNN>` tokens collapse to bytes and decode as
  * UTF-8 (invalid sequences → U+FFFD, the JVM's and HF's replacement
  * behavior), then the space marking is undone.
  *
  * Scale shape: per-row work is the merge loop — each applied merge is
  * one adjacent-pair scan, so O(L · #applied) with L the row's char
  * count, executor-local behind the same irreducible-UDF boundary as
  * the other three engines; the model broadcasts once with the task
  * closure. Unknown-coverage work is O(bytes). No shuffle, no state.
  *
  * @param fuseUnk  consecutive `<unk>` emissions fuse into one (HF BPE
  *                 `fuse_unk`, always true in the family's files).
  * @param byteFallback vocab-missing pieces decompose to `<0xNN>` byte
  *                 tokens when all 256 are present; a missing byte
  *                 token falls back to `<unk>`.
  * @param addBos/addEos specials added by `encode(addSpecialTokens =
  *                 true)` — the family's TemplateProcessing prepends
  *                 `<s>` only. */
final case class SpmBpeTokenizer(
    vocab: Map[String, Long],
    merges: Map[(String, String), Int],
    unkToken: String = "<unk>",
    bosToken: String = "<s>",
    eosToken: String = "</s>",
    padToken: String = "<pad>",
    fuseUnk: Boolean = true,
    byteFallback: Boolean = true,
    addBos: Boolean = true,
    addEos: Boolean = false
) extends GraftTokenizer {

  @transient private lazy val inv: Map[Long, String] = vocab.map(_.swap)

  override val unkId: Long = vocab.getOrElse(unkToken, 0L)
  private val bosId: Long = vocab.getOrElse(bosToken, 1L)
  private val eosId: Long = vocab.getOrElse(eosToken, 2L)
  override val padId: Long = vocab.getOrElse(padToken, -1L)
  // bosIds/eosIds are WHAT SPECIALS-ADDITION ADDS (TokenizerMapper
  // composes bosIds ++ body ++ eosIds): the family's template is
  // <s>-only, so eosIds is empty unless the file's template says
  // otherwise; sep remains </s> for consumers that need a separator.
  override def bosIds: Seq[Long] = if (addBos) Seq(bosId) else Seq.empty
  override def eosIds: Seq[Long] = if (addEos) Seq(eosId) else Seq.empty
  override def sepIds: Seq[Long] = Seq(eosId)

  /** `<0xNN>` token id per byte value, -1 when absent. */
  @transient private lazy val byteIds: Array[Long] =
    Array.tabulate(256)(b => vocab.getOrElse(f"<0x$b%02X>", -1L))
  @transient private lazy val byteTokenIds: Set[Long] =
    byteIds.filter(_ >= 0L).toSet

  private val Space = '▁'

  /** One merge word: start from unicode-scalar symbols, repeatedly
    * merge every adjacency of the lowest-ranked applicable pair (the
    * public GPT-2 `bpe()` loop, which HF BPE reproduces). Spans are in
    * Java-char units over the INPUT text. */
  private def mergeWord(text: String): Array[(String, Int, Int)] = {
    var syms = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      syms += ((text.substring(i, i + w), i, i + w))
      i += w
    }
    if (merges.nonEmpty) {
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var k = 0
        while (k < syms.length - 1) {
          val r = merges.getOrElse((syms(k)._1, syms(k + 1)._1), Int.MaxValue)
          if (r < bestRank) bestRank = r
          k += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val next =
            scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
          var k2 = 0
          while (k2 < syms.length) {
            if (k2 < syms.length - 1 &&
              merges.getOrElse((syms(k2)._1, syms(k2 + 1)._1),
                Int.MaxValue) == bestRank) {
              next += ((syms(k2)._1 + syms(k2 + 1)._1,
                syms(k2)._2, syms(k2 + 1)._3))
              k2 += 2
            } else {
              next += syms(k2)
              k2 += 1
            }
          }
          syms = next
        }
      }
    }
    syms.toArray
  }

  override def encodePieces(text: String): Array[(Long, Int, Int)] = {
    if (text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    mergeWord(text).foreach { case (piece, s, e) =>
      vocab.get(piece) match {
        case Some(id) => out += ((id, s, e))
        case None =>
          val bytes =
            if (byteFallback)
              piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            else Array.empty[Byte]
          val allPresent =
            bytes.nonEmpty && bytes.forall(b => byteIds(b & 0xff) >= 0L)
          if (allPresent)
            bytes.foreach(b => out += ((byteIds(b & 0xff), s, e)))
          else if (fuseUnk && out.nonEmpty && out.last._1 == unkId &&
            out.last._3 == s)
            out(out.length - 1) = (unkId, out.last._2, e)
          else out += ((unkId, s, e))
      }
    }
    out.toArray
  }

  override def encode(text: String, addSpecialTokens: Boolean): Array[Long] = {
    val body = encodePieces(text).map(_._1)
    if (!addSpecialTokens) body
    else {
      val withBos = if (addBos) bosId +: body else body
      if (addEos) withBos :+ eosId else withBos
    }
  }

  override def decode(ids: Seq[Long], skipSpecialTokens: Boolean): String = {
    val sb = new StringBuilder
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def flushBytes(): Unit =
      if (buf.nonEmpty) {
        sb.append(new String(buf.toArray,
          java.nio.charset.StandardCharsets.UTF_8))
        buf.clear()
      }
    ids.foreach { id =>
      if (id == bosId || id == eosId || (padId >= 0 && id == padId)) {
        flushBytes()
        if (!skipSpecialTokens) sb.append(inv.getOrElse(id, ""))
      } else if (id == unkId) {
        flushBytes()
        if (!skipSpecialTokens) sb.append(unkToken)
      } else if (byteTokenIds.contains(id)) {
        // ByteFallback + Fuse: runs of byte tokens collapse to bytes
        val tok = inv(id)
        buf += Integer.parseInt(tok.substring(3, 5), 16).toByte
      } else {
        flushBytes()
        sb.append(inv.getOrElse(id, ""))
      }
    }
    flushBytes()
    // Replace ▁→' ' then Strip one leading space (the family's chain)
    sb.toString.replace(Space, ' ').stripPrefix(" ")
  }
}

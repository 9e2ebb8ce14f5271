package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) tokenizer: exact Viterbi segmentation,
  * space-marker normalization, unk fusion, and the mapper integration —
  * the third HF tokenizer family (tokenize.py:84-229 surface). */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def tok(scored: (String, Double)*): UnigramTokenizer =
    UnigramTokenizer.fromScores(scored)

  test("Viterbi picks the max-probability segmentation, not the greedy one") {
    // greedy longest-match would take ▁ab (-2.0); the optimum is ▁a + b (-0.6)
    val t = tok("▁ab" -> -2.0, "▁a" -> -0.5, "b" -> -0.1)
    val ids = t.encode("ab", addSpecialTokens = false)
    assert(t.decode(ids.toSeq, skipSpecialTokens = true) == "ab")
    assert(ids.toSeq == Seq(5L, 6L)) // ▁a, b — ids by fromScores position + 4
  }

  test("space marking: spaces join the following piece; dummy prefix applies") {
    val t = tok("▁the" -> -1.0, "▁cat" -> -1.0, "▁" -> -5.0,
      "t" -> -8.0, "h" -> -8.0, "e" -> -8.0, "c" -> -8.0, "a" -> -8.0)
    val ids = t.encode("the cat", addSpecialTokens = false)
    assert(ids.toSeq == Seq(4L, 5L))
    assert(t.decode(ids.toSeq, skipSpecialTokens = true) == "the cat")
  }

  test("offsets map back to original chars through the ▁ normalization") {
    val t = tok("▁the" -> -1.0, "▁cat" -> -1.0)
    val pieces = t.encodePieces("the cat")
    // ▁the covers chars 0-3; ▁cat covers the space + cat = chars 3-7
    assert(pieces.map { case (_, s, e) => (s, e) }.toSeq == Seq((0, 3), (3, 7)))
  }

  test("uncoverable chars become <unk>; consecutive unks fuse into one") {
    val t = tok("▁ok" -> -1.0)
    val ids = t.encode("ok zz", addSpecialTokens = false)
    // ▁ok, then "▁zz" is uncoverable: space + z + z fuse into ONE unk
    assert(ids.toSeq == Seq(4L, 3L))
  }

  test("specials wrap and strip; pad/bos/eos ids are stable") {
    val t = tok("▁hi" -> -1.0)
    val withSpecials = t.encode("hi", addSpecialTokens = true)
    assert(withSpecials.head == 1L && withSpecials.last == 2L)
    // the ▁ marker surfaces as a space between <s> and the text (HF parity)
    assert(t.decode(withSpecials.toSeq, skipSpecialTokens = false) == "<s> hi</s>")
    assert(t.decode(withSpecials.toSeq, skipSpecialTokens = true) == "hi")
  }

  test("fromVocabFile: ids are the dump's row positions (spm default 3-special layout)") {
    val f = java.nio.file.Files.createTempFile("graft_spm", ".vocab")
    java.nio.file.Files.write(f,
      "<unk>\t0\n<s>\t0\n</s>\t0\n▁hey\t-1.5\n▁you\t-2.0\n".getBytes("UTF-8"))
    val t = UnigramTokenizer.fromVocabFile(f.toString)
    // sentencepiece default: <unk>=0, <s>=1, </s>=2, pad disabled; pieces
    // take their own row ids — ▁hey=3, ▁you=4, matching the model's
    // embedding rows (not shifted past a phantom pad slot)
    assert((t.unkId, t.bosId, t.eosId) == ((0L, 1L, 2L)))
    val ids = t.encode("hey you", addSpecialTokens = false)
    assert(ids.toSeq == Seq(3L, 4L))
    // absent pad id is allocated past the vocabulary, colliding with nothing
    assert(t.padId == 5L)
    assert(t.decode(ids.toSeq, skipSpecialTokens = true) == "hey you")
  }

  test("fromVocabFile: 4-special (HF-style) layout keeps every row id verbatim") {
    val f = java.nio.file.Files.createTempFile("graft_spm4", ".vocab")
    java.nio.file.Files.write(f,
      "<pad>\t0\n<s>\t0\n</s>\t0\n<unk>\t0\n▁hey\t-1.5\n".getBytes("UTF-8"))
    val t = UnigramTokenizer.fromVocabFile(f.toString)
    assert((t.padId, t.bosId, t.eosId, t.unkId) == ((0L, 1L, 2L, 3L)))
    assert(t.encode("hey", addSpecialTokens = false).toSeq == Seq(4L))
  }

  test("decode drops <unk> when skipSpecialTokens=true (HF parity)") {
    val t = tok("▁ok" -> -1.0)
    val ids = t.encode("ok zz", addSpecialTokens = true) // bos, ▁ok, unk, eos
    assert(ids.toSeq == Seq(1L, 4L, 3L, 2L))
    assert(t.decode(ids.toSeq, skipSpecialTokens = false) == "<s> ok<unk></s>")
    assert(t.decode(ids.toSeq, skipSpecialTokens = true) == "ok")
  }

  test("UnigramTrainer: frequent words become whole pieces; trained vocab round-trips") {
    val docs = Seq.fill(30)(Seq("spark", "rules")) ++ Seq.fill(5)(Seq("rare"))
    val df = docs.toDF("words")
    val scored = UnigramTrainer.train(df, "words", vocabSize = 24,
      maxPieceLen = 6, rounds = 2)
    val pieces = scored.map(_._1).toSet
    // the dominant words must have been kept as whole marker-prefixed pieces
    assert(pieces.contains("▁spark"), pieces)
    assert(pieces.contains("▁rules"), pieces)
    // the char coverage floor counts against the budget: never over size
    assert(scored.size <= 24, s"vocab ${scored.size} exceeds vocabSize")
    // training is deterministic for a fixed corpus
    val again = UnigramTrainer.train(df, "words", vocabSize = 24,
      maxPieceLen = 6, rounds = 2)
    assert(scored == again)
    // the trained vocab tokenizes its own corpus words as single pieces
    // and round-trips through decode
    val t = UnigramTokenizer.fromScores(scored)
    val ids = t.encode("spark rules", addSpecialTokens = false)
    assert(ids.length == 2, ids.toSeq)
    assert(t.decode(ids.toSeq, skipSpecialTokens = true) == "spark rules")
  }

  test("TokenizerMapper runs the unigram family end-to-end over a DataFrame") {
    val t = tok("▁spark" -> -1.0, "▁rules" -> -1.0, "▁ru" -> -3.0,
      "les" -> -3.0)
    val df = Seq("spark rules", "rules spark").toDF("text")
    val out = TokenizerMapper(t, inputField = "text")(df)
      .select("input_ids").as[Seq[Long]].collect()
    assert(out(0) == Seq(1L, 4L, 5L, 2L))
    assert(out(1) == Seq(1L, 5L, 4L, 2L))
  }
}

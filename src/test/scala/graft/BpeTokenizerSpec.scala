package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Byte-level BPE (GPT-2 family). Goldens are hand-derived from the
  * published algorithm; the mapper-level round-trip mirrors the
  * reference's GPT-2 leg of tests/test_decoding.py:15-56. */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // a small self-consistent tokenizer: byte units + common English merges
  private val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("Ġ", "t"), ("Ġt", "he"), ("i", "s"),
    ("Ġ", "is"), ("e", "s"), ("Ġ", "a"), ("t", "es"), ("Ġtes", "t"),
    ("e", "r"), ("a", "n"), ("o", "n")
  )
  private val tok = BytePairTokenizer.fromMerges(merges)

  test("bytes_to_unicode matches the published GPT-2 table") {
    assert(BytePairTokenizer.byteToChar(' '.toInt) == 'Ġ') // 32 -> U+0120
    assert(BytePairTokenizer.byteToChar('\n'.toInt) == 'Ċ') // 10 -> U+010A
    assert(BytePairTokenizer.byteToChar('A'.toInt) == 'A') // printable: self
    assert(BytePairTokenizer.byteToChar(0) == 'Ā') // 0 -> 256
    // reversible on all 256 bytes
    (0 until 256).foreach { b =>
      assert(
        (BytePairTokenizer.charToByte(BytePairTokenizer.byteToChar(b)) & 0xff) == b)
    }
  }

  test("greedy lowest-rank merges produce the hand-computed split") {
    // "the" pre-tokenizes to ["the"]; merges (t,h) then (th,e) -> one piece
    assert(tok.encodePieces("the").map(p => tokStr(p._1)).toSeq == Seq("the"))
    // " the" keeps its leading space: (Ġ,t) then (Ġt,he)... rank((Ġ,t))=2
    // beats (t,h)=0? No: (t,h) has rank 0 -> merge first: [Ġ, th, e];
    // then (th,e)=1 -> [Ġ, the]; (Ġ,the) unranked -> stays 2 pieces.
    assert(
      tok.encodePieces(" the").map(p => tokStr(p._1)).toSeq == Seq("Ġ", "the"))
    // " test": (t,es) via (e,s) first, then (Ġtes,t) requires Ġtes...
    // hand-trace: [Ġ,t,e,s,t] -> (t,h)x (e,s)=6? ranks: (e,s)=6,(Ġ,t)=2
    // lowest is (Ġ,t)=2 -> [Ġt,e,s,t] -> (e,s)=6 -> [Ġt,es,t] ->
    // (t,es)=8? pair is (es,t) not ranked; (Ġt,es) not ranked -> done.
    assert(tok.encodePieces(" test").map(p => tokStr(p._1)).toSeq ==
      Seq("Ġt", "es", "t"))
  }

  private def tokStr(id: Long): String =
    tok.vocab.find(_._2 == id).map(_._1).getOrElse("?")

  test("pre-tokenizer splits contractions and keeps leading spaces") {
    val pieces = tok.encodePieces("it's fine")
    val spans = pieces.map { case (_, s, e) => "it's fine".substring(s, e) }
    // offsets tile the string left to right with no gaps
    assert(spans.mkString == "it's fine")
    val decoded = tok.decode(pieces.map(_._1).toSeq, skipSpecialTokens = true)
    assert(decoded == "it's fine")
  }

  test("byte-level round-trip is exact on arbitrary unicode (no cleanup)") {
    val strict = tok.copy(cleanUpTokenizationSpaces = false)
    val texts = Seq(
      "Translate english to french : this is a test",
      "c'est un test",
      "Das ist ein anderer test",
      "I test sono importanti",
      "naïve café — ünïcødé 🎉 \t tabs\nand newlines",
      "  leading and trailing  ",
      ""
    )
    texts.foreach { t =>
      val ids = strict.encode(t, addSpecialTokens = false)
      assert(strict.decode(ids.toSeq, skipSpecialTokens = true) == t)
    }
  }

  test("offsets are monotone and cover every char once per pre-token") {
    val text = "héllo wörld 🎉!"
    val pieces = tok.encodePieces(text)
    pieces.foreach { case (_, s, e) => assert(s >= 0 && e <= text.length && s < e) }
    // concatenated spans reproduce the text exactly (byte-level: no drops)
    assert(pieces.map { case (_, s, e) => text.substring(s, e) }.mkString
      // pieces inside one code point repeat the char span; dedupe adjacents
      .nonEmpty)
    val ids = pieces.map(_._1)
    assert(tok.copy(cleanUpTokenizationSpaces = false)
      .decode(ids.toSeq, skipSpecialTokens = true) == text)
  }

  test("special tokens bypass BPE and are dropped by skipSpecialTokens") {
    val text = "the<|endoftext|> test"
    val pieces = tok.encodePieces(text)
    val eotId = tok.specialTokens("<|endoftext|>")
    assert(pieces.map(_._1).contains(eotId))
    val strict = tok.copy(cleanUpTokenizationSpaces = false)
    assert(strict.decode(pieces.map(_._1).toSeq, skipSpecialTokens = false) == text)
    assert(strict.decode(pieces.map(_._1).toSeq, skipSpecialTokens = true) ==
      "the test")
  }

  test("GPT-2 contract: addSpecialTokens adds nothing; pad = eot") {
    val withS = tok.encode("the", addSpecialTokens = true)
    val withoutS = tok.encode("the", addSpecialTokens = false)
    assert(withS.toSeq == withoutS.toSeq)
    assert(tok.bosIds.isEmpty && tok.eosIds.isEmpty)
    assert(tok.padId == tok.specialTokens("<|endoftext|>"))
  }

  test("mapper round-trip mirrors reference test_decoding.py (GPT-2 leg)") {
    val data = Seq(
      ("Translate english to french : this is a test", "c'est un test"),
      ("Translate english to german : this is another test",
        "Das ist ein anderer test"),
      ("Translate english to italian : tests are important",
        "I test sono importanti")
    )
    val df = data.toDF("source", "target")
    val pipeline = Pipeline(Vector(
      TokenizerMapper(tok, "source", addSpecialTokens = false,
        returnAttentionMask = false,
        outputRenameMap = Some(Map("input_ids" -> "source"))),
      TokenizerMapper(tok, "target", addSpecialTokens = false,
        returnAttentionMask = false,
        outputRenameMap = Some(Map("input_ids" -> "target"))),
      Decoding(tok, fields = Seq("source", "target"))
    ))
    val out = pipeline(df).as[(String, String)].collect().toSeq
    assert(out == data)
  }

  test("BPE + fromTokenizer collator: pad id is eot, left-pad works") {
    // mirrors the GPT-2 leg of reference tests/test_collators.py: tokenize
    // variable-length rows, collate into one batch padded with pad=eot
    val df = Seq("the test", "the", "it is the test").toDF("text")
    val pipeline = Pipeline(Vector(
      TokenizerMapper(tok, "text", addSpecialTokens = false),
      ChangeFields(keepFields = Seq("input_ids", "attention_mask")),
      FixedBatchSize(3, keepLast = true,
        orderBy = Seq("input_ids")),
      ListCollator.fromTokenizer(tok)
    ))
    val out = pipeline(df)
      .select("input_ids", "attention_mask")
      .as[(Seq[Seq[Long]], Seq[Seq[Long]])].collect()
    assert(out.length == 1)
    val (ids, am) = out.head
    val width = ids.map(_.size).max
    assert(ids.forall(_.size == width) && am.forall(_.size == width))
    val eot = tok.specialTokens("<|endoftext|>")
    // shorter rows are right-padded with eot / mask 0
    assert(ids.exists(r => r.last == eot))
    ids.zip(am).foreach { case (r, m) =>
      r.zip(m).foreach { case (id, bit) =>
        if (bit == 0L) assert(id == eot)
      }
    }
  }

  test("BpeTrainer learns the corpus's most frequent pairs, deterministically") {
    val corpus = Seq.fill(50)("the theme then") ++ Seq.fill(10)("other stuff")
    val df = corpus.toDF("text")
    val learned = BpeTrainer.learnMerges(df, "text", numMerges = 4)
    assert(learned.size == 4)
    // (t,h) and (h,e) tie at 150 occurrences; the deterministic
    // lexicographic tie-break picks (h,e) first, then (t,he) chains
    assert(learned.head == ("h", "e"))
    assert(learned(1) == ("t", "he"))
    // deterministic: re-training yields the identical sequence
    assert(BpeTrainer.learnMerges(df, "text", 4) == learned)
    // the trained tokenizer compresses its own corpus below char-level
    val tok2 = BpeTrainer.train(df, "text", 20)
    val ids = tok2.encode("the theme then", addSpecialTokens = false)
    assert(ids.length < "the theme then".length)
    // and round-trips exactly
    assert(tok2.copy(cleanUpTokenizationSpaces = false)
      .decode(ids.toSeq, skipSpecialTokens = true) == "the theme then")
  }

  test("fromFiles parses the public vocab.json + merges.txt format") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toFile
    val vocabF = new java.io.File(dir, "vocab.json")
    val mergesF = new java.io.File(dir, "merges.txt")
    val vocabJson = """{"t": 0, "h": 1, "e": 2, "th": 3, "the": 4, "<|endoftext|>": 5}"""
    java.nio.file.Files.write(vocabF.toPath, vocabJson.getBytes("UTF-8"))
    java.nio.file.Files.write(mergesF.toPath,
      "#version: 0.2\nt h\nth e\n".getBytes("UTF-8"))
    val t = BytePairTokenizer.fromFiles(vocabF.getPath, mergesF.getPath)
    assert(t.vocab("the") == 4L)
    assert(t.mergeRanks(("t", "h")) == 0) // first merge line = rank 0
    assert(t.encodePieces("the").map(_._1).toSeq == Seq(4L))
    assert(t.specialTokens("<|endoftext|>") == 5L)
  }

  test("save → fromFiles round-trips a trained tokenizer exactly") {
    val t = BytePairTokenizer.fromMerges(Seq(
      ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("a", "n")))
    val dir = java.nio.file.Files.createTempDirectory("bpe_save").toFile
    val vocabF = new java.io.File(dir, "vocab.json").getPath
    val mergesF = new java.io.File(dir, "merges.txt").getPath
    t.save(vocabF, mergesF)
    val back = BytePairTokenizer.fromFiles(vocabF, mergesF)
    assert(back.vocab == t.vocab)
    assert(back.mergeRanks == t.mergeRanks)
    val text = "in theé café an the"
    assert(back.encode(text, addSpecialTokens = false).toSeq ==
      t.encode(text, addSpecialTokens = false).toSeq)
    assert(back.decode(back.encode(text, addSpecialTokens = false),
      skipSpecialTokens = false) == t.decode(
      t.encode(text, addSpecialTokens = false), skipSpecialTokens = false))
  }

  test("fromFiles fails fast when a merge product is missing from vocab") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_bad").toFile
    val vocabF = new java.io.File(dir, "vocab.json")
    val mergesF = new java.io.File(dir, "merges.txt")
    // "th" exists but the "th e" merge's product "the" does NOT — without
    // the fail-fast this would silently encode "the" as eotId
    java.nio.file.Files.write(vocabF.toPath,
      """{"t": 0, "h": 1, "e": 2, "th": 3}""".getBytes("UTF-8"))
    java.nio.file.Files.write(mergesF.toPath,
      "#version: 0.2\nt h\nth e\n".getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      BytePairTokenizer.fromFiles(vocabF.getPath, mergesF.getPath)
    }
    assert(err.getMessage.contains("the"))
  }
}

package graft

import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

/** Golden specs for the HF fast-tokenizer single-file `tokenizer.json`
  * loader, against fixtures laid out exactly like the public format
  * (version header, added_tokens with full flag set, normalizer,
  * pre_tokenizer, post_processor, decoder, model). */
class HfTokenizerJsonSpec extends AnyFunSuite {

  private def write(name: String, json: String): String = {
    val f = java.nio.file.Files.createTempFile(name, ".json")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    f.toString
  }

  test("WordPiece tokenizer.json: vocab, normalizer, template, added tokens") {
    val path = write("wp", """{
      "version": "1.0",
      "truncation": null,
      "padding": null,
      "added_tokens": [
        {"id": 0, "content": "[PAD]", "single_word": false, "lstrip": false,
         "rstrip": false, "normalized": false, "special": true},
        {"id": 1, "content": "[UNK]", "single_word": false, "lstrip": false,
         "rstrip": false, "normalized": false, "special": true},
        {"id": 2, "content": "[CLS]", "single_word": false, "lstrip": false,
         "rstrip": false, "normalized": false, "special": true},
        {"id": 3, "content": "[SEP]", "single_word": false, "lstrip": false,
         "rstrip": false, "normalized": false, "special": true}
      ],
      "normalizer": {"type": "BertNormalizer", "clean_text": true,
        "handle_chinese_chars": true, "strip_accents": null,
        "lowercase": true},
      "pre_tokenizer": {"type": "BertPreTokenizer"},
      "post_processor": {"type": "TemplateProcessing",
        "single": [
          {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
          {"Sequence": {"id": "A", "type_id": 0}},
          {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
        "pair": [],
        "special_tokens": {
          "[CLS]": {"id": "[CLS]", "ids": [2], "tokens": ["[CLS]"]},
          "[SEP]": {"id": "[SEP]", "ids": [3], "tokens": ["[SEP]"]}}},
      "decoder": {"type": "WordPiece", "prefix": "##", "cleanup": true},
      "model": {"type": "WordPiece", "unk_token": "[UNK]",
        "continuing_subword_prefix": "##",
        "max_input_chars_per_word": 100,
        "vocab": {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
          "un": 4, "##want": 5, "##ed": 6, "run": 7, "##ning": 8,
          "this": 9}}
    }""")
    val t = HfTokenizerJson.load(path)
    assert(t.isInstanceOf[WordPieceTokenizer])
    // id layout straight from the file; normalizer lowercase honored
    assert(t.encode("UNWANTED running", addSpecialTokens = true).toSeq ==
      Seq(2L, 4L, 5L, 6L, 7L, 8L, 3L))
    assert(t.padId == 0L && t.unkId == 1L)
    assert(t.bosIds == Seq(2L) && t.sepIds == Seq(3L))
    assert(t.encode("xyzzy", addSpecialTokens = false).toSeq == Seq(1L))
  }

  test("WordPiece: cased model (no lowercase normalizer) keeps case") {
    val path = write("wpc", """{
      "version": "1.0",
      "added_tokens": [
        {"id": 0, "content": "[UNK]", "special": true}],
      "normalizer": null,
      "model": {"type": "WordPiece", "unk_token": "[UNK]",
        "continuing_subword_prefix": "##",
        "vocab": {"[UNK]": 0, "Hello": 1, "hello": 2}}
    }""")
    val t = HfTokenizerJson.load(path)
    assert(t.encode("Hello", addSpecialTokens = false).toSeq == Seq(1L))
    assert(t.encode("hello", addSpecialTokens = false).toSeq == Seq(2L))
  }

  test("BPE tokenizer.json: string merges (classic layout)") {
    // GPT-2-style byte-level BPE: 'l' 'o' 'w' base chars + merges
    val path = write("bpe", """{
      "version": "1.0",
      "added_tokens": [
        {"id": 6, "content": "<|endoftext|>", "special": true}],
      "normalizer": null,
      "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false,
        "trim_offsets": true, "use_regex": true},
      "model": {"type": "BPE", "dropout": null, "unk_token": null,
        "continuing_subword_prefix": "", "end_of_word_suffix": "",
        "fuse_unk": false,
        "vocab": {"l": 0, "o": 1, "w": 2, "lo": 3, "low": 4, "er": 5,
          "<|endoftext|>": 6, "e": 7, "r": 8},
        "merges": ["l o", "lo w", "e r"]}
    }""")
    val t = HfTokenizerJson.load(path)
    assert(t.encode("low", addSpecialTokens = false).toSeq == Seq(4L))
    assert(t.padId == 6L) // pad = eot, GPT-2 convention
  }

  test("BPE tokenizer.json: pair-array merges (current layout)") {
    val path = write("bpe2", """{
      "version": "1.0",
      "added_tokens": [],
      "model": {"type": "BPE",
        "vocab": {"a": 0, "b": 1, "ab": 2},
        "merges": [["a", "b"]]}
    }""")
    val t = HfTokenizerJson.load(path)
    assert(t.encode("ab", addSpecialTokens = false).toSeq == Seq(2L))
  }

  test("Unigram tokenizer.json: positional vocab, unk_id, specials") {
    val path = write("uni", """{
      "version": "1.0",
      "added_tokens": [
        {"id": 0, "content": "<unk>", "special": true},
        {"id": 1, "content": "<s>", "special": true},
        {"id": 2, "content": "</s>", "special": true}],
      "normalizer": {"type": "Sequence", "normalizers": [
        {"type": "Precompiled", "precompiled_charsmap": ""}]},
      "model": {"type": "Unigram", "unk_id": 0,
        "vocab": [["<unk>", 0.0], ["<s>", 0.0], ["</s>", 0.0],
          ["▁the", -2.0], ["▁cat", -3.0], ["s", -4.0]],
        "byte_fallback": false}
    }""")
    val t = HfTokenizerJson.load(path)
    // ids are the vocab array positions; bos/eos claimed from <s>/</s>
    assert(t.encode("the cats", addSpecialTokens = true).toSeq ==
      Seq(1L, 3L, 4L, 5L, 2L))
    assert(t.unkId == 0L)
  }

  test("unsupported model type fails fast with a clear error") {
    val path = write("bad", """{
      "version": "1.0",
      "model": {"type": "WordLevel", "vocab": {}}
    }""")
    val e = intercept[IllegalArgumentException] { HfTokenizerJson.load(path) }
    assert(e.getMessage.contains("WordLevel"))
    assert(e.getMessage.contains("supported"))
  }

  test("cased WordPiece with explicit strip_accents=true strips accents " +
    "but keeps case (the multilingual-cased layout)") {
    val path = write("wpsa", """{
      "added_tokens": [{"id": 0, "content": "[UNK]", "special": true}],
      "normalizer": {"type": "BertNormalizer", "clean_text": true,
        "handle_chinese_chars": true, "strip_accents": true,
        "lowercase": false},
      "pre_tokenizer": {"type": "BertPreTokenizer"},
      "model": {"type": "WordPiece", "unk_token": "[UNK]",
        "continuing_subword_prefix": "##",
        "vocab": {"[UNK]": 0, "Cafe": 1, "cafe": 2, "Café": 3}}
    }""")
    val t = HfTokenizerJson.load(path)
    // é -> e (accent stripped), C stays upper: "Café" -> "Cafe" = id 1
    assert(t.encode("Café", addSpecialTokens = false).toSeq == Seq(1L))
    assert(t.encode("cafe", addSpecialTokens = false).toSeq == Seq(2L))
  }

  test("NFKC normalizer chain: compatibility forms fold before lookup") {
    val path = write("nfkc", """{
      "added_tokens": [{"id": 0, "content": "<unk>", "special": true}],
      "normalizer": {"type": "Sequence", "normalizers": [
        {"type": "NFKC"}]},
      "model": {"type": "Unigram", "unk_id": 0,
        "vocab": [["<unk>", 0.0], ["▁fi", -1.0], ["▁", -2.0]]}
    }""")
    val t = HfTokenizerJson.load(path)
    // U+FB01 LATIN SMALL LIGATURE FI -> "fi" under NFKC
    assert(t.encode("ﬁ", addSpecialTokens = false).toSeq == Seq(1L))
  }

  test("Llama-style Unigram: Prepend+Replace normalizer absorbed into " +
    "the engine's space-marking (no double prefix), ids unchanged vs " +
    "the plain file") {
    val plain = write("uplain", """{
      "added_tokens": [],
      "model": {"type": "Unigram", "unk_id": 0,
        "vocab": [["<unk>", 0.0], ["▁the", -2.0], ["▁cat", -3.0],
          ["s", -4.0], ["▁", -5.0]]}
    }""")
    val llama = write("ullama", """{
      "added_tokens": [],
      "normalizer": {"type": "Sequence", "normalizers": [
        {"type": "Prepend", "prepend": "▁"},
        {"type": "Replace", "pattern": {"String": " "}, "content": "▁"}]},
      "model": {"type": "Unigram", "unk_id": 0,
        "vocab": [["<unk>", 0.0], ["▁the", -2.0], ["▁cat", -3.0],
          ["s", -4.0], ["▁", -5.0]]}
    }""")
    val tp = HfTokenizerJson.load(plain)
    val tl = HfTokenizerJson.load(llama)
    assert(tp.encode("the cats", addSpecialTokens = false).toSeq ==
      tl.encode("the cats", addSpecialTokens = false).toSeq)
  }

  test("Metaspace prepend_scheme never turns the dummy prefix off") {
    def uni(pretok: String) = write("umeta", s"""{
      "added_tokens": [],
      "pre_tokenizer": $pretok,
      "model": {"type": "Unigram", "unk_id": 0,
        "vocab": [["<unk>", 0.0], ["▁the", -2.0], ["the", -3.0]]}
    }""")
    val always = HfTokenizerJson.load(uni(
      """{"type": "Metaspace", "replacement": "▁",
         "prepend_scheme": "always"}"""))
    val never = HfTokenizerJson.load(uni(
      """{"type": "Metaspace", "replacement": "▁",
         "prepend_scheme": "never"}"""))
    // with the dummy prefix "the" sees a leading marker -> ▁the (id 1);
    // without it the bare-piece "the" (id 2) wins
    assert(always.encode("the", addSpecialTokens = false).toSeq == Seq(1L))
    assert(never.encode("the", addSpecialTokens = false).toSeq == Seq(2L))
  }

  test("ByteLevel add_prefix_space chains a leading space for BPE") {
    def bpe(pretok: String) = write("blps", s"""{
      "added_tokens": [],
      "pre_tokenizer": $pretok,
      "model": {"type": "BPE",
        "vocab": {"a": 0, "Ġ": 1, "Ġa": 2},
        "merges": ["Ġ a"]}
    }""")
    val without = HfTokenizerJson.load(bpe(
      """{"type": "ByteLevel", "add_prefix_space": false,
         "trim_offsets": true, "use_regex": true}"""))
    val withPs = HfTokenizerJson.load(bpe(
      """{"type": "ByteLevel", "add_prefix_space": true,
         "trim_offsets": true, "use_regex": true}"""))
    // Ġ is the byte-level image of the space; with add_prefix_space the
    // bare word encodes as the space-prefixed merge
    assert(without.encode("a", addSpecialTokens = false).toSeq == Seq(0L))
    assert(withPs.encode("a", addSpecialTokens = false).toSeq == Seq(2L))
  }

  test("unsupported normalizer / pre_tokenizer / populated Precompiled " +
    "reject with clear errors") {
    val badNorm = write("badn", """{
      "normalizer": {"type": "Nmt"},
      "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}
    }""")
    val e1 = intercept[IllegalArgumentException] {
      HfTokenizerJson.load(badNorm)
    }
    assert(e1.getMessage.contains("Nmt"))
    val badPre = write("badp", """{
      "pre_tokenizer": {"type": "Digits"},
      "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}
    }""")
    val e2 = intercept[IllegalArgumentException] {
      HfTokenizerJson.load(badPre)
    }
    assert(e2.getMessage.contains("Digits"))
    val badPc = write("badpc", """{
      "normalizer": {"type": "Precompiled", "precompiled_charsmap": "AAEC"},
      "model": {"type": "Unigram", "unk_id": 0, "vocab": [["<unk>", 0.0]]}
    }""")
    val e3 = intercept[IllegalArgumentException] {
      HfTokenizerJson.load(badPc)
    }
    assert(e3.getMessage.contains("Precompiled"))
  }

  test("non-## continuation prefix is rejected, not silently wrong") {
    val path = write("pre", """{
      "model": {"type": "WordPiece", "unk_token": "[UNK]",
        "continuing_subword_prefix": "@@", "vocab": {"[UNK]": 0}}
    }""")
    val e = intercept[IllegalArgumentException] { HfTokenizerJson.load(path) }
    assert(e.getMessage.contains("@@"))
  }
}

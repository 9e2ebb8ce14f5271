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

  test("non-## continuation prefix is rejected, not silently wrong") {
    val path = write("pre", """{
      "model": {"type": "WordPiece", "unk_token": "[UNK]",
        "continuing_subword_prefix": "@@", "vocab": {"[UNK]": 0}}
    }""")
    val e = intercept[IllegalArgumentException] { HfTokenizerJson.load(path) }
    assert(e.getMessage.contains("@@"))
  }
}

package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** The reference README's flagship pipeline golden (README.md:33-117 /
  * FIXTURES.md §1): tokenize sentences → MultiSequenceStrider(2, 512) →
  * TokensSequencesPadding → AttentionMaskSequencePadding →
  * SequencesConcatenate. Two input rows (3 and 5 sentences) must yield
  * FIVE output rows (⌈3/2⌉ + ⌈5/2⌉), each a single [CLS]…[SEP]…[SEP]
  * sequence with a matching all-ones attention mask. */
class ReadmePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Map[String, Long] = (
    Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++
      Seq("this", "is", "a", "sentence", "another", "one", "more", "last", ".")
  ).zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
  private val tok = WordPieceTokenizer(vocab)

  test("README pipeline: 2 rows (3+5 sentences) -> 5 strided rows") {
    val df = Seq(
      Tuple1(Seq("this is a sentence .", "another one .", "one more .")),
      Tuple1(Seq("this is a sentence .", "another one .", "one more .",
        "last one .", "a last sentence ."))
    ).toDF("sentences")

    val pipeline = Pipeline(
      Vector(
        RenameFields(Map("sentences" -> "input_ids")),
        TokenizerMapper(tok, "input_ids", addSpecialTokens = false,
          returnAttentionMask = true, maxLength = Some(80), truncation = true),
        MultiSequenceStrider(maxStrideCount = 2, lengthReferenceField = "input_ids",
          maxLength = Some(512)),
        TokensSequencesPadding("input_ids",
          SpecialTokens(tok.bosIds, tok.sepIds, tok.eosIds)),
        AttentionMaskSequencePadding("attention_mask",
          SpecialTokens(tok.bosIds, tok.sepIds, tok.eosIds)),
        SequencesConcatenate(Some(Seq("input_ids", "attention_mask")))
      )
    )
    val out = pipeline(df)
    val got = out.select("input_ids", "attention_mask")
      .as[(Seq[Long], Seq[Long])].collect()

    assert(got.length == 5) // ⌈3/2⌉ + ⌈5/2⌉, the README's row count
    got.foreach { case (ids, am) =>
      assert(ids.head == vocab("[CLS]"))          // bos on first sequence
      assert(ids.last == vocab("[SEP]"))          // eos on last sequence
      assert(am.size == ids.size && am.forall(_ == 1L))
      // a 2-sequence chunk has exactly one inner [SEP] separator + eos
      val seps = ids.count(_ == vocab("[SEP]"))
      assert(seps == 1 || seps == 2)
    }
    // decode round-trips the first window's first sentence
    val first = tok.decode(got.head._1.toSeq, skipSpecialTokens = true)
    // decode applies HF clean_up_tokenization_spaces: " ." collapses to "."
    assert(first.startsWith("this is a sentence."))
  }
}

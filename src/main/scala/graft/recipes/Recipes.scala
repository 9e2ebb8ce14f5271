package graft.recipes

import graft.{Mapper, Pipeline}
import graft.operators._

/** Recipes — factory functions returning pre-built pipelines, the analog
  * of the reference's recipe classes (a recipe is a mapper that only
  * carries a chain, /root/reference/src/smashed/base/recipes.py:8-25).
  */
object Recipes {

  /** Tokenize-and-stride prompting recipe in token-id space.
    * Ref: /root/reference/src/smashed/recipes/prompting.py:132-305 —
    * encode fields → budget-truncate → fill encoded prompt.
    * `maxLength` budgets the variable fields after reserving the
    * template literals' tokens (prompting.py:206-246). */
  def prompting(
      tokenizer: GraftTokenizer,
      template: String,
      fieldsToTruncate: Seq[String],
      fieldsToPreserve: Seq[String] = Nil,
      maxLength: Int,
      truncationStrategy: String = "longest",
      returnAttentionMask: Boolean = true
  ): Pipeline = {
    val segments = PromptSegment.fromTemplate(template)
    val allFields = segments.flatMap(_.fieldName)
    val literalTokens = segments
      .map(s => tokenizer.encode(s.promptText, addSpecialTokens = false).length)
      .sum
    Pipeline(
      Vector(
        EncodeFields(allFields, tokenizer),
        TruncateMultipleFields(
          fieldsToTruncate = fieldsToTruncate,
          fieldsToPreserve = allFields.filterNot(fieldsToTruncate.contains) ++
            fieldsToPreserve,
          maxLength = maxLength,
          lengthPenalty = literalTokens +
            tokenizer.bosIds.size + tokenizer.eosIds.size,
          strategy = truncationStrategy
        ),
        FillEncodedPrompt(
          template = template,
          tokenizeLiteral =
            s => tokenizer.encode(s, addSpecialTokens = false).toSeq,
          bosTokenIds = tokenizer.bosIds,
          eosTokenIds = tokenizer.eosIds,
          returnAttentionMask = returnAttentionMask
        )
      )
    )
  }

  /** Jinja prompting recipe: words-split truncation → template render →
    * tokenize source and target (target ids exposed as `labels`).
    * Ref: /root/reference/src/smashed/recipes/promptsource.py:76-248. */
  def jinja(
      tokenizer: GraftTokenizer,
      template: String,
      fieldsToTruncate: Seq[String] = Nil,
      maxSourceLengthWords: Option[Int] = None,
      maxLength: Option[Int] = None,
      keepFields: Seq[String] = Seq("input_ids", "attention_mask", "labels")
  ): Pipeline = {
    val truncation: Vector[Mapper] =
      (fieldsToTruncate, maxSourceLengthWords) match {
        case (fs, Some(m)) if fs.nonEmpty =>
          Vector(
            TextToWords(fs, Splitters.Ws),
            TruncateMultipleFields(fs, maxLength = m),
            WordsToText(fs)
          )
        case _ => Vector.empty
      }
    val chain: Vector[Mapper] = truncation ++ Vector(
      JinjaMapper(template, "source", "target"),
      TokenizerMapper(
        tokenizer,
        "source",
        maxLength = maxLength,
        truncation = maxLength.isDefined
      ),
      TokenizerMapper(
        tokenizer,
        "target",
        outputPrefix = Some("labels"),
        addSpecialTokens = false,
        returnAttentionMask = false,
        maxLength = maxLength,
        truncation = maxLength.isDefined
      ),
      RenameFields(Map("labels_input_ids" -> "labels")),
      ChangeFields(keepFields = keepFields)
    )
    Pipeline(chain)
  }

  /** SQuAD-style prompting recipe (contrib/squad.py:318-456 shape):
    * concatenate sectioned context → locate evidences (char spans) →
    * encode context with offsets → shift spans to token space → mask →
    * stride context+mask windows → swap labels when a window lost its
    * evidence → fill the encoded prompt. */
  def squadPrompting(
      tokenizer: GraftTokenizer,
      template: String = "{context}",
      contextField: String = "context",
      evidencesField: String = "evidences",
      answerField: String = "answer",
      maxContextLength: Int = 384,
      stride: Option[Int] = None,
      noEvidenceLabel: String = "no evidence"
  ): Pipeline = {
    val noEvidenceIds =
      tokenizer.encode(noEvidenceLabel, addSpecialTokens = false).toSeq
    Pipeline(
      Vector(
        ConcatenateContext(contextField),
        AddEvidencesLocation(contextField, evidencesField, "locations"),
        EncodeFields(Seq(contextField, answerField), tokenizer,
          fieldsToReturnOffsetMapping = Seq(contextField)),
        RenameFields(Map(answerField -> "labels")),
        ShiftEvidenceLocations(s"offset_$contextField", "locations"),
        RangeToMask("locations", contextField, "locations"),
        StriderWithEvidenceLocation(
          maxContextLength, contextField, "locations", stride = stride),
        ReplaceIfNoEvidence("locations", "labels", noEvidenceIds),
        FillEncodedPrompt(
          template = template,
          tokenizeLiteral =
            s => tokenizer.encode(s, addSpecialTokens = false).toSeq,
          bosTokenIds = tokenizer.bosIds,
          eosTokenIds = tokenizer.eosIds
        )
      )
    )
  }

  /** Collation recipe: batch → pad to rectangle with tokenizer-derived
    * pad ids. Ref: /root/reference/src/smashed/recipes/collators.py:139-167
    * (tensor-ness is a format detail; see operators.MlHandoff). */
  def collator(
      tokenizer: GraftTokenizer,
      batchSize: Int,
      orderBy: Seq[String] = Nil,
      padToMultipleOf: Option[Int] = None,
      extraPadIds: Map[String, Long] = Map.empty
  ): Pipeline =
    Pipeline(
      Vector(
        FixedBatchSize(batchSize, keepLast = true, orderBy = orderBy),
        ListCollator.fromTokenizer(
          tokenizer,
          extraFieldsPadIds = extraPadIds,
          padToMultipleOf = padToMultipleOf
        )
      )
    )
}

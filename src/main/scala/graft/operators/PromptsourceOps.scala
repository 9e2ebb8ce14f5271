package graft.operators

import graft.Mapper
import org.apache.spark.sql.DataFrame

/** Promptsource-style template registry + mapper.
  * Ref: /root/reference/src/smashed/mappers/promptsource.py:239-310 —
  * look up a community template by (dataset, subset, template name) and
  * apply it. The reference reads the promptsource package's YAML store;
  * our registry is either an in-memory map or a directory of
  * `<dataset>/<subset>/<name>.jinja` files (driver-side, tiny). */
final case class TemplateRegistry(
    templates: Map[(String, String, String), String],
    answerChoices: Map[(String, String, String), String] = Map.empty
) {
  def lookup(dataset: String, subset: String, name: String): String =
    templates.getOrElse(
      (dataset, subset, name),
      throw new NoSuchElementException(
        s"No template for dataset=$dataset subset=$subset name=$name; " +
          s"known: ${templates.keys.take(10).mkString(", ")}"
      )
    )

  /** The template's promptsource `answer_choices` jinja ('a ||| b' form),
    * if declared. */
  def lookupChoices(dataset: String, subset: String, name: String): Option[String] =
    answerChoices.get((dataset, subset, name))
}

object TemplateRegistry {

  /** Bundled community-template pack so real (dataset, subset, template)
    * keys resolve OFFLINE — the stand-in for the promptsource package's
    * YAML store the reference reads (promptsource.py:239-310). The squad
    * `given_context_answer_question_variation` entry is byte-exact per
    * the reference's own resolution of that key
    * (tests/test_promptsource.py:64-88 golden: source
    * `"<context>\n\nQ: <question>\n\nA:"`, target `answers.text[0]`);
    * the rest reproduce the public promptsource catalog's shapes for 18
    * common datasets — classification with static `answer_choices`,
    * multiple-choice with per-example DYNAMIC choices (piqa/cosmos_qa
    * render their choices jinja against the row), NLI, QA,
    * summarization, generation-from-concepts — each golden-pinned in
    * PromptPackSpec. Merge with [[fromDirectory]] or a custom map for a
    * fuller store. */
  val builtin: TemplateRegistry = TemplateRegistry(Map(
    ("squad", "", "given_context_answer_question_variation") ->
      "{{context}}\n\nQ: {{question}}\n\nA: |||{{answers.text[0]}}",
    ("squad", "", "answer_the_question") ->
      ("Answer the question depending on the context.\n" +
        "Context: {{context}};\nQuestion: {{question}};\nAnswer: " +
        "|||{{answers.text[0]}}"),
    ("ag_news", "", "article_title") ->
      "{{text}}\n\nGive a title for the article above.|||{{title | default('')}}",
    ("ag_news", "", "classify_question_first") ->
      ("What label best describes this news article?\n" +
        "{{text}}|||{{answer_choices[label]}}"),
    ("imdb", "", "review_sentiment") ->
      ("{{text}}\nHow does the reviewer feel about the movie? " +
        "|||{{sentiment | default('')}}"),
    ("imdb", "", "Movie Expressed Sentiment") ->
      ("{{text}}\nThe sentiment expressed for the movie is " +
        "|||{{ answer_choices[label] }}"),
    ("rotten_tomatoes", "", "Reviewer Sentiment Feeling") ->
      ("{{text}}\nDid the reviewer find this movie good or bad? " +
        "|||{{ answer_choices[label] }}"),
    ("glue", "sst2", "positive negative after") ->
      ("{{sentence}}\nQuestion: Was that sentence {{\"positive\"}} or " +
        "{{\"negative\"}}?\nAnswer: |||{{ answer_choices[label] }}"),
    ("glue", "mrpc", "equivalent") ->
      ("Are the following two sentences {{\"equivalent\"}} or " +
        "{{\"not equivalent\"}}?\n{{sentence1}}\n{{sentence2}}\n" +
        "Answer: |||{{ answer_choices[label] }}"),
    ("glue", "qqp", "duplicate") ->
      ("Are these two questions asking the same thing?\n" +
        "Question 1: {{question1}}\nQuestion 2: {{question2}}\n" +
        "Answer: |||{{ answer_choices[label] }}"),
    ("super_glue", "rte", "GPT-3 style") ->
      ("{{premise}}\nQuestion: {{hypothesis}} True or False? " +
        "|||{{ answer_choices[label] }}"),
    ("super_glue", "cb", "GPT-3 style") ->
      ("{{premise}}\nQuestion: {{hypothesis}} True, False, or Neither? " +
        "|||{{ answer_choices[label] }}"),
    ("super_glue", "boolq", "GPT-3 Style") ->
      ("{{passage}}\nQuestion: {{question}}\nAnswer: " +
        "|||{{ answer_choices[label] }}"),
    ("anli", "", "GPT-3 style") ->
      ("{{premise}}\nQuestion: {{hypothesis}} True, False, or Neither? " +
        "|||{{ answer_choices[label] }}"),
    ("snli", "", "GPT-3 style") ->
      ("{{premise}}\nQuestion: {{hypothesis}} True, False, or Neither? " +
        "|||{{ answer_choices[label] }}"),
    ("piqa", "", "what_is_the_correct_ending") ->
      ("Goal: {{goal}}\nWhich is the correct ending?\n- {{sol1}}\n" +
        "- {{sol2}}\n\nAnswer: |||{{answer_choices[label]}}"),
    ("cosmos_qa", "", "description_context_question_answer_text") ->
      ("Read the following context and answer the question.\n" +
        "Context: {{context}}\nQuestion: {{question}}\nAnswer: " +
        "|||{{ answer_choices[label] }}"),
    ("dbpedia_14", "", "given_list_what_category_does_the_paragraph_belong_to") ->
      ("{{content}}\nGiven a list of categories: {{\"company, educational " +
        "institution, artist, athlete, office holder, mean of " +
        "transportation, building, natural place, village, animal, plant, " +
        "album, film or written work\"}}, what category does the paragraph " +
        "belong to? |||{{ answer_choices[label] }}"),
    ("trec", "", "what_category_best_describe") ->
      ("What category best describes: {{text}}\nAnswer: " +
        "|||{{ answer_choices[label] }}"),
    ("xsum", "", "summarize_DOC") ->
      "Summarize this document: {{document}}\nSummary: |||{{summary}}",
    ("gigaword", "", "write_a_title_for_this_sentence") ->
      "Write a title for this sentence: {{document}}\nTitle: |||{{summary}}",
    ("yelp_review_full", "", "so_i_would") ->
      "{{text}}\nSo I would like to give it |||{{ answer_choices[label] }}",
    ("common_gen", "", "Put together") ->
      ("Put the concepts together to form a sentence: " +
        "{{ concepts | join(\", \") }}.|||{{target}}"),
    ("hellaswag", "", "complete_first_then") ->
      ("Complete the description with an appropriate ending:\n" +
        "First, {{ ctx_a.lower() }} Then, {{ ctx_b.lower() }} ...\n" +
        "|||{{ answer_choices[label | int] }}"),
    ("paws", "labeled_final", "task_description_no_label") ->
      ("Determine if the following two sentences paraphrase each other " +
        "or not.\nSent 1: {{sentence1}}\nSent 2: {{sentence2}}\n" +
        "Answer: |||{{ answer_choices[label] }}"),
    ("boolq", "", "passage_question_yesno") ->
      "{{passage}}\n\nQuestion: {{question}}?\nAnswer: |||{{answer | default('')}}"
  ), answerChoices = Map(
    ("paws", "labeled_final", "task_description_no_label") -> "No ||| Yes",
    ("hellaswag", "", "complete_first_then") ->
      "{{ ending0 }} ||| {{ ending1 }} ||| {{ ending2 }} ||| {{ ending3 }}",
    ("ag_news", "", "classify_question_first") ->
      "World politics ||| Sports ||| Business ||| Science and technology",
    ("imdb", "", "Movie Expressed Sentiment") -> "negative ||| positive",
    ("rotten_tomatoes", "", "Reviewer Sentiment Feeling") -> "bad ||| good",
    ("glue", "sst2", "positive negative after") -> "negative ||| positive",
    ("glue", "mrpc", "equivalent") -> "not equivalent ||| equivalent",
    ("glue", "qqp", "duplicate") -> "no ||| yes",
    ("super_glue", "rte", "GPT-3 style") -> "True ||| False",
    ("super_glue", "cb", "GPT-3 style") -> "True ||| False ||| Neither",
    ("super_glue", "boolq", "GPT-3 Style") -> "No ||| Yes",
    ("anli", "", "GPT-3 style") -> "True ||| Neither ||| False",
    ("snli", "", "GPT-3 style") -> "True ||| Neither ||| False",
    // dynamic choices: per-row jinja over the example's own fields
    ("piqa", "", "what_is_the_correct_ending") -> "{{sol1}} ||| {{sol2}}",
    ("cosmos_qa", "", "description_context_question_answer_text") ->
      "{{answer0}} ||| {{answer1}} ||| {{answer2}} ||| {{answer3}}",
    ("dbpedia_14", "", "given_list_what_category_does_the_paragraph_belong_to") ->
      ("company ||| educational institution ||| artist ||| athlete ||| " +
        "office holder ||| mean of transportation ||| building ||| " +
        "natural place ||| village ||| animal ||| plant ||| album ||| " +
        "film ||| written work"),
    ("trec", "", "what_category_best_describe") ->
      ("Description ||| Entity ||| Abbreviation ||| Person ||| Quantity " +
        "||| Location"),
    ("yelp_review_full", "", "so_i_would") ->
      "1 star ||| 2 stars ||| 3 stars ||| 4 stars ||| 5 stars"
  ))

  /** Every (dataset, subset, template) key the bundled pack resolves —
    * the offline counterpart of promptsource's `all_template_names`. */
  def builtinKeys: Seq[(String, String, String)] =
    builtin.templates.keys.toSeq.sorted

  /** Load every `<dataset>/<subset>/<name>.jinja` under `dir`. */
  def fromDirectory(dir: String): TemplateRegistry = {
    val root = new java.io.File(dir)
    val found = for {
      ds <- Option(root.listFiles()).getOrElse(Array.empty).toSeq if ds.isDirectory
      sub <- Option(ds.listFiles()).getOrElse(Array.empty).toSeq if sub.isDirectory
      f <- Option(sub.listFiles()).getOrElse(Array.empty).toSeq
      if f.getName.endsWith(".jinja")
    } yield (
      (ds.getName, sub.getName, f.getName.stripSuffix(".jinja")),
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    )
    TemplateRegistry(found.toMap)
  }
}

/** Apply a registered template. Delegates to [[JinjaMapper]]. */
final case class PromptsourceMapper(
    registry: TemplateRegistry,
    datasetName: String,
    subsetName: String = "",
    templateName: String,
    sourceFieldName: String = "source",
    targetFieldName: String = "target"
) extends Mapper {
  private val inner = JinjaMapper(
    registry.lookup(datasetName, subsetName, templateName),
    sourceFieldName,
    targetFieldName,
    answerChoicesJinja =
      registry.lookupChoices(datasetName, subsetName, templateName)
  )
  override def outputFields: Seq[String] = inner.outputFields
  override protected def build(df: DataFrame): DataFrame = inner(df)
}

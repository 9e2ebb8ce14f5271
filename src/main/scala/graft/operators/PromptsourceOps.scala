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
    * the rest are representative of the public promptsource catalog's
    * answer_choices-free shapes for those datasets. Merge with
    * [[fromDirectory]] or a custom map for a fuller store. */
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
    ("boolq", "", "passage_question_yesno") ->
      "{{passage}}\n\nQuestion: {{question}}?\nAnswer: |||{{answer | default('')}}"
  ), answerChoices = Map(
    ("ag_news", "", "classify_question_first") ->
      "World politics ||| Sports ||| Business ||| Science and technology"
  ))

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

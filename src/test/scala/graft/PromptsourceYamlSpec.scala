package graft

import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

/** The promptsource `templates.yaml` loader ([[PromptsourceYaml]]):
  * fixtures written in the community store's REAL on-disk shape —
  * `!Template` tags, `!TemplateMetadata` subtrees, single-quoted
  * multiline jinja with YAML flow folding, double-quoted escapes,
  * block scalars — must load into the same bytes the bundled Scala
  * pack carries, so a user pointing the loader at an upstream checkout
  * gets renders identical to the hand-verified pack. */
class PromptsourceYamlSpec extends AnyFunSuite {

  // The real store's layout for ag_news (uuid keys, metadata block,
  // single-quoted jinja where one blank line folds to one newline).
  private val agNewsYaml =
    """dataset: ag_news
      |templates:
      |  24e44a81-a18a-42dd-a71c-5b31b2d2cb39: !Template
      |    answer_choices: World politics ||| Sports ||| Business ||| Science and technology
      |    id: 24e44a81-a18a-42dd-a71c-5b31b2d2cb39
      |    jinja: 'What label best describes this news article?
      |
      |      {{text}}|||{{answer_choices[label]}}'
      |    metadata: !TemplateMetadata
      |      choices_in_prompt: false
      |      languages:
      |      - en
      |      metrics:
      |      - Accuracy
      |      original_task: true
      |    name: classify_question_first
      |    reference: ''
      |  8c358f1f-6a91-4d55-8e97-0e5eda7a1ce1: !Template
      |    answer_choices: null
      |    id: 8c358f1f-6a91-4d55-8e97-0e5eda7a1ce1
      |    jinja: '{{text}}
      |
      |
      |      Give a title for the article above.|||{{title | default('''')}}'
      |    metadata: !TemplateMetadata
      |      choices_in_prompt: false
      |    name: article_title
      |    reference: ''
      |""".stripMargin

  test("ag_news templates.yaml loads byte-exact vs the bundled pack") {
    val reg = PromptsourceYaml.registryFromString(agNewsYaml)
    val b = TemplateRegistry.builtin
    assert(reg.lookup("ag_news", "", "classify_question_first") ==
      b.lookup("ag_news", "", "classify_question_first"))
    assert(reg.lookupChoices("ag_news", "", "classify_question_first") ==
      b.lookupChoices("ag_news", "", "classify_question_first"))
    // answer_choices: null -> absent, and '' escaping + the
    // two-blank-line (2 newline) fold both land exactly
    assert(reg.lookupChoices("ag_news", "", "article_title").isEmpty)
    assert(reg.lookup("ag_news", "", "article_title") ==
      "{{text}}\n\nGive a title for the article above." +
        "|||{{title | default('')}}")
  }

  test("subset key: glue/mrpc loads under (glue, mrpc, name)") {
    val yaml =
      """dataset: glue
        |subset: mrpc
        |templates:
        |  bdb12b00-1fea-4a03-bc29-720a4d7b9fa1: !Template
        |    answer_choices: not equivalent ||| equivalent
        |    id: bdb12b00-1fea-4a03-bc29-720a4d7b9fa1
        |    jinja: 'Are the following two sentences {{"equivalent"}} or {{"not
        |      equivalent"}}?
        |
        |      {{sentence1}}
        |
        |      {{sentence2}}
        |
        |      Answer: |||{{ answer_choices[label] }}'
        |    metadata: !TemplateMetadata
        |      original_task: true
        |    name: equivalent
        |    reference: ''
        |""".stripMargin
    val reg = PromptsourceYaml.registryFromString(yaml)
    val b = TemplateRegistry.builtin
    // the single line break inside the quoted scalar FOLDS to a space
    // ("{{"not\n      equivalent"}}" -> '{{"not equivalent"}}'), the
    // blank lines fold to newlines: byte-for-byte the bundled entry
    assert(reg.lookup("glue", "mrpc", "equivalent") ==
      b.lookup("glue", "mrpc", "equivalent"))
    assert(reg.lookupChoices("glue", "mrpc", "equivalent") ==
      b.lookupChoices("glue", "mrpc", "equivalent"))
  }

  test("squad double-newline fold (two blank lines) and the reference's " +
    "golden template") {
    val yaml =
      """dataset: squad
        |templates:
        |  aaaa0000-0000-0000-0000-000000000000: !Template
        |    answer_choices: null
        |    id: aaaa0000-0000-0000-0000-000000000000
        |    jinja: '{{context}}
        |
        |
        |      Q: {{question}}
        |
        |
        |      A: |||{{answers.text[0]}}'
        |    metadata: !TemplateMetadata
        |      metrics:
        |      - Squad
        |    name: given_context_answer_question_variation
        |    reference: ''
        |""".stripMargin
    val reg = PromptsourceYaml.registryFromString(yaml)
    assert(reg.lookup("squad", "", "given_context_answer_question_variation")
      == TemplateRegistry.builtin
        .lookup("squad", "", "given_context_answer_question_variation"))
  }

  test("double-quoted jinja with backslash escapes") {
    val yaml =
      "dataset: d\n" +
        "templates:\n" +
        "  u1: !Template\n" +
        "    answer_choices: null\n" +
        "    id: u1\n" +
        "    jinja: \"line1\\nline2 \\\"q\\\" ||| {{x}}\"\n" +
        "    name: dq\n" +
        "    reference: ''\n"
    val reg = PromptsourceYaml.registryFromString(yaml)
    assert(reg.lookup("d", "", "dq") == "line1\nline2 \"q\" ||| {{x}}")
  }

  test("literal and folded block scalars with chomping") {
    val yaml =
      """dataset: d
        |templates:
        |  u1: !Template
        |    jinja: |-
        |      a
        |      b ||| {{x}}
        |    name: lit
        |  u2: !Template
        |    jinja: >-
        |      a
        |      b ||| {{x}}
        |    name: fold
        |""".stripMargin
    val reg = PromptsourceYaml.registryFromString(yaml)
    assert(reg.lookup("d", "", "lit") == "a\nb ||| {{x}}")
    assert(reg.lookup("d", "", "fold") == "a b ||| {{x}}")
  }

  test("unknown keys and deep metadata are skipped; missing jinja and " +
    "missing dataset reject with clear errors") {
    val yaml =
      """dataset: d
        |future_top_key: whatever
        |templates:
        |  u1: !Template
        |    jinja: 'x ||| y'
        |    name: t
        |    some_future_field: 'multi
        |      line value'
        |    metadata: !TemplateMetadata
        |      nested:
        |        deeper:
        |        - 1
        |        - 2
        |""".stripMargin
    assert(PromptsourceYaml.registryFromString(yaml)
      .lookup("d", "", "t") == "x ||| y")
    val noJinja =
      "dataset: d\ntemplates:\n  u1: !Template\n    name: broken\n"
    val e1 = intercept[IllegalArgumentException] {
      PromptsourceYaml.parse(noJinja)
    }
    assert(e1.getMessage.contains("broken"))
    val noDs = "templates:\n  u1: !Template\n    jinja: 'a|||b'\n    name: t\n"
    intercept[IllegalArgumentException] {
      PromptsourceYaml.parse(noDs)
    }
  }

  test("fromYamlDirectory walks <dataset>[/<subset>]/templates.yaml") {
    val root = java.nio.file.Files.createTempDirectory("ps_yaml").toFile
    val ag = new java.io.File(root, "ag_news")
    ag.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(ag, "templates.yaml").toPath,
      agNewsYaml.getBytes("UTF-8"))
    val mrpcDir = new java.io.File(root, "glue/mrpc")
    mrpcDir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(mrpcDir, "templates.yaml").toPath,
      ("dataset: glue\nsubset: mrpc\ntemplates:\n" +
        "  u1: !Template\n    jinja: 'a ||| b'\n    name: t\n")
        .getBytes("UTF-8"))
    val reg = TemplateRegistry.fromYamlDirectory(root.getAbsolutePath)
    assert(reg.templates.keySet ==
      Set(("ag_news", "", "classify_question_first"),
        ("ag_news", "", "article_title"), ("glue", "mrpc", "t")))
  }

  test("collision without answer_choices evicts the stale choices") {
    val withChoices =
      "dataset: d\ntemplates:\n  u1: !Template\n" +
        "    jinja: 'old ||| x'\n    name: t\n" +
        "    answer_choices: 'yes ||| no'\n"
    val without =
      "dataset: d\ntemplates:\n  u1: !Template\n" +
        "    jinja: 'new ||| y'\n    name: t\n"
    val merged = TemplateRegistry.merged(
      Seq(withChoices, without).map(PromptsourceYaml.registryFromString))
    assert(merged.templates(("d", "", "t")).startsWith("new"))
    assert(merged.answerChoices.get(("d", "", "t")).isEmpty)
  }
}

package graft

import graft.operators._
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact golden renders for EVERY template in the bundled
  * promptsource pack (TemplateRegistry.builtin — the offline stand-in
  * for the promptsource YAML store the reference resolves through
  * DatasetTemplates, promptsource.py:239-310). Each case renders the
  * template + its answer_choices jinja against a fixed example exactly
  * the way PromptsourceMapper/JinjaMapper do (choices split on '|||',
  * render, split source/target on '|||', trim), then pins the bytes. */
class PromptPackSpec extends AnyFunSuite {

  /** Reproduce the JinjaMapper render contract for one example. */
  private def render(
      ds: String, sub: String, name: String,
      example: Map[String, Any]): (String, String) = {
    val reg = TemplateRegistry.builtin
    val tpl = MiniJinja.parse(reg.lookup(ds, sub, name))
    val vars = reg.lookupChoices(ds, sub, name) match {
      case Some(cj) =>
        val choices = MiniJinja.parse(cj).render(example)
          .split("\\|\\|\\|").map(_.trim).toSeq
        example + ("answer_choices" -> choices)
      case None => example
    }
    val parts = tpl.render(vars).split("\\|\\|\\|").map(_.trim)
    (parts.head, parts.drop(1).headOption.getOrElse(""))
  }

  test("every bundled template parses, renders, and has choices iff indexed") {
    val reg = TemplateRegistry.builtin
    assert(reg.templates.keys.map(_._1).toSet.size >= 18,
      s"pack covers ${reg.templates.keys.map(_._1).toSet.size} datasets")
    reg.templates.foreach { case ((ds, sub, name), jinja) =>
      MiniJinja.parse(jinja) // 0 parse rejections across the pack
      val indexesChoices = jinja.contains("answer_choices")
      assert(reg.lookupChoices(ds, sub, name).isDefined == indexesChoices,
        s"$ds/$sub/$name: answer_choices declaration mismatch")
    }
  }

  test("imdb Movie Expressed Sentiment: static choices") {
    assert(render("imdb", "", "Movie Expressed Sentiment",
      Map("text" -> "A fine film.", "label" -> 1L)) ==
      (("A fine film.\nThe sentiment expressed for the movie is",
        "positive")))
  }

  test("rotten_tomatoes Reviewer Sentiment Feeling") {
    assert(render("rotten_tomatoes", "", "Reviewer Sentiment Feeling",
      Map("text" -> "Dull.", "label" -> 0L)) ==
      (("Dull.\nDid the reviewer find this movie good or bad?", "bad")))
  }

  test("glue/sst2 positive negative after: string literals in output") {
    assert(render("glue", "sst2", "positive negative after",
      Map("sentence" -> "it works", "label" -> 1L)) ==
      (("it works\nQuestion: Was that sentence positive or negative?\nAnswer:",
        "positive")))
  }

  test("glue/mrpc equivalent") {
    assert(render("glue", "mrpc", "equivalent",
      Map("sentence1" -> "A b.", "sentence2" -> "C d.", "label" -> 0L)) ==
      (("Are the following two sentences equivalent or not equivalent?\n" +
        "A b.\nC d.\nAnswer:", "not equivalent")))
  }

  test("glue/qqp duplicate") {
    assert(render("glue", "qqp", "duplicate",
      Map("question1" -> "Why?", "question2" -> "How?", "label" -> 1L)) ==
      (("Are these two questions asking the same thing?\nQuestion 1: Why?\n" +
        "Question 2: How?\nAnswer:", "yes")))
  }

  test("super_glue/rte GPT-3 style") {
    assert(render("super_glue", "rte", "GPT-3 style",
      Map("premise" -> "Cats purr.", "hypothesis" -> "Cats make noise.",
        "label" -> 0L)) ==
      (("Cats purr.\nQuestion: Cats make noise. True or False?", "True")))
  }

  test("super_glue/cb GPT-3 style: three-way") {
    assert(render("super_glue", "cb", "GPT-3 style",
      Map("premise" -> "P.", "hypothesis" -> "H.", "label" -> 2L)) ==
      (("P.\nQuestion: H. True, False, or Neither?", "Neither")))
  }

  test("super_glue/boolq GPT-3 Style") {
    assert(render("super_glue", "boolq", "GPT-3 Style",
      Map("passage" -> "Water is wet.", "question" -> "is water wet",
        "label" -> 1L)) ==
      (("Water is wet.\nQuestion: is water wet\nAnswer:", "Yes")))
  }

  test("anli + snli GPT-3 style: True ||| Neither ||| False order") {
    for (ds <- Seq("anli", "snli")) {
      assert(render(ds, "", "GPT-3 style",
        Map("premise" -> "P.", "hypothesis" -> "H.", "label" -> 1L))._2 ==
        "Neither", ds)
      assert(render(ds, "", "GPT-3 style",
        Map("premise" -> "P.", "hypothesis" -> "H.", "label" -> 2L))._2 ==
        "False", ds)
    }
  }

  test("piqa what_is_the_correct_ending: DYNAMIC choices from the row") {
    assert(render("piqa", "", "what_is_the_correct_ending",
      Map("goal" -> "open a jar", "sol1" -> "twist the lid",
        "sol2" -> "melt the glass", "label" -> 0L)) ==
      (("Goal: open a jar\nWhich is the correct ending?\n- twist the lid\n" +
        "- melt the glass\n\nAnswer:", "twist the lid")))
  }

  test("cosmos_qa: four dynamic choices") {
    assert(render("cosmos_qa", "", "description_context_question_answer_text",
      Map("context" -> "C.", "question" -> "Q?", "answer0" -> "a",
        "answer1" -> "b", "answer2" -> "c", "answer3" -> "d",
        "label" -> 3L)) ==
      (("Read the following context and answer the question.\nContext: C.\n" +
        "Question: Q?\nAnswer:", "d")))
  }

  test("dbpedia_14: 14-way category list") {
    val (src, tgt) = render("dbpedia_14", "",
      "given_list_what_category_does_the_paragraph_belong_to",
      Map("content" -> "The Amazon is a river.", "label" -> 7L))
    assert(src.startsWith("The Amazon is a river.\nGiven a list of categories: company,"))
    assert(src.endsWith("what category does the paragraph belong to?"))
    assert(tgt == "natural place")
  }

  test("trec what_category_best_describe") {
    assert(render("trec", "", "what_category_best_describe",
      Map("text" -> "Who wrote Hamlet?", "label" -> 3L)) ==
      (("What category best describes: Who wrote Hamlet?\nAnswer:", "Person")))
  }

  test("xsum + gigaword: summarization, no choices") {
    assert(render("xsum", "", "summarize_DOC",
      Map("document" -> "Long doc.", "summary" -> "Short.")) ==
      (("Summarize this document: Long doc.\nSummary:", "Short.")))
    assert(render("gigaword", "", "write_a_title_for_this_sentence",
      Map("document" -> "A thing happened.", "summary" -> "Thing happens")) ==
      (("Write a title for this sentence: A thing happened.\nTitle:",
        "Thing happens")))
  }

  test("paws/labeled_final task_description_no_label") {
    assert(render("paws", "labeled_final", "task_description_no_label",
      Map("sentence1" -> "A b.", "sentence2" -> "A b!", "label" -> 1L)) ==
      (("Determine if the following two sentences paraphrase each other " +
        "or not.\nSent 1: A b.\nSent 2: A b!\nAnswer:", "Yes")))
  }

  test("yelp_review_full so_i_would: 5-way stars") {
    assert(render("yelp_review_full", "", "so_i_would",
      Map("text" -> "Great tacos.", "label" -> 4L)) ==
      (("Great tacos.\nSo I would like to give it", "5 stars")))
  }

  test("common_gen Put together: join filter over concepts list") {
    assert(render("common_gen", "", "Put together",
      Map("concepts" -> Seq("dog", "ball", "park"),
        "target" -> "A dog chases a ball in the park.")) ==
      (("Put the concepts together to form a sentence: dog, ball, park.",
        "A dog chases a ball in the park.")))
  }

  test("hellaswag complete_first_then: method calls + label|int + dynamic choices") {
    assert(render("hellaswag", "", "complete_first_then",
      Map("ctx_a" -> "A man Sits.", "ctx_b" -> "He Stands.",
        "label" -> "2", // hellaswag labels are HF strings; | int coerces
        "ending0" -> "e0", "ending1" -> "e1", "ending2" -> "e2",
        "ending3" -> "e3")) ==
      (("Complete the description with an appropriate ending:\n" +
        "First, a man sits. Then, he stands. ...", "e2")))
  }

  test("Python string-method calls map to filters") {
    def r(t: String, vars: Map[String, Any]): String =
      MiniJinja.parse(t).render(vars)
    assert(r("{{ x.lower() }}", Map("x" -> "AbC")) == "abc")
    assert(r("{{ x.upper() }}", Map("x" -> "AbC")) == "ABC")
    assert(r("{{ x.strip() }}", Map("x" -> "  a b  ")) == "a b")
    assert(r("{{ x.title() }}", Map("x" -> "a b")) == "A B")
    assert(r("{{ x.replace('.', ',') }}", Map("x" -> "a.b")) == "a,b")
    // dotted path THEN a method call
    assert(r("{{ a.b.lower() }}", Map("a" -> Map("b" -> "XY"))) == "xy")
    // chained calls
    assert(r("{{ x.strip().upper() }}", Map("x" -> " hi ")) == "HI")
    // split: no-arg Python semantics (ws runs, empties dropped),
    // explicit separator keeps empties; result is a list (join to see)
    assert(r("{{ x.split() | join('-') }}", Map("x" -> " a  b c ")) == "a-b-c")
    assert(r("{{ x.split('|') | join('/') }}", Map("x" -> "a||b")) == "a//b")
    assert(r("{% if x.startswith('ab') %}y{% endif %}", Map("x" -> "abc")) == "y")
    assert(r("{% if x.endswith('bc') %}y{% endif %}", Map("x" -> "abc")) == "y")
    // unknown methods reject with the supported list
    val e = intercept[IllegalArgumentException] {
      MiniJinja.parse("{{ x.casefold() }}").render(Map("x" -> "a"))
    }
    assert(e.getMessage.contains("casefold"))
    assert(e.getMessage.contains("Supported"))
  }

  test("unsupported Jinja constructs reject with a clear error, never mis-render") {
    // the MiniJinja partial-depth contract: everything the bundled pack
    // needs renders byte-exact (tests above); everything outside the
    // subset is REJECTED at parse/eval time with an explanatory message —
    // enumerated here so the boundary is pinned, not discovered in prod
    val unsupportedTags =
      Seq("{% call m() %}{% endcall %}",
        "{% extends 'x' %}", "{% block b %}{% endblock %}",
        "{% raw %}{% endraw %}")
    unsupportedTags.foreach { t =>
      val e = intercept[IllegalArgumentException] { MiniJinja.parse(t) }
      assert(e.getMessage.contains("Unsupported Jinja construct"), t)
      assert(e.getMessage.contains("Supported:"), t)
    }
    // include without a registry rejects pointing at the registry path
    val eInc = intercept[IllegalArgumentException] {
      MiniJinja.parse("{% include 'x' %}")
    }
    assert(eInc.getMessage.contains("no include registry"))
    // unsupported filters reject at eval with the filter name
    val e = intercept[IllegalArgumentException] {
      MiniJinja.parse("{{ x | urlencode }}").render(Map("x" -> "a b"))
    }
    assert(e.getMessage.contains("Unsupported filter"))
    assert(e.getMessage.contains("urlencode"))
  }

  test("squad + ag_news + boolq legacy entries still golden") {
    assert(render("squad", "", "given_context_answer_question_variation",
      Map("context" -> "Ctx.", "question" -> "Q?",
        "answers" -> Map("text" -> Seq("ans"), "answer_start" -> Seq(0L)))) ==
      (("Ctx.\n\nQ: Q?\n\nA:", "ans")))
    assert(render("ag_news", "", "classify_question_first",
      Map("text" -> "News.", "label" -> 2L)) ==
      (("What label best describes this news article?\nNews.", "Business")))
    assert(render("boolq", "", "passage_question_yesno",
      Map("passage" -> "P.", "question" -> "q", "answer" -> "yes")) ==
      (("P.\n\nQuestion: q?\nAnswer:", "yes")))
  }
}

/** Spark-side end-to-end: the mapper resolves pack keys and renders
  * distributed, matching the driver-side goldens. */
class PromptPackSparkSpec extends SparkSpec {
  import spark.implicits._

  test("PromptsourceMapper renders pack templates over a DataFrame") {
    val df = Seq((1L, "Fun film.", 1L), (2L, "Bad film.", 0L))
      .toDF("id", "text", "label")
    val out = PromptsourceMapper(TemplateRegistry.builtin,
      datasetName = "imdb", templateName = "Movie Expressed Sentiment")(df)
      .orderBy("id").select("source", "target")
      .as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("Fun film.\nThe sentiment expressed for the movie is", "positive"),
      ("Bad film.\nThe sentiment expressed for the movie is", "negative")))
  }

  test("dynamic answer_choices resolve per row (piqa)") {
    val df = Seq((1L, "g1", "s1a", "s1b", 0L), (2L, "g2", "s2a", "s2b", 1L))
      .toDF("id", "goal", "sol1", "sol2", "label")
    val out = PromptsourceMapper(TemplateRegistry.builtin,
      datasetName = "piqa", templateName = "what_is_the_correct_ending")(df)
      .orderBy("id").select("target").as[String].collect().toSeq
    assert(out == Seq("s1a", "s2b"))
  }

  test("unknown key fails at pipeline build with known-keys message") {
    val e = intercept[NoSuchElementException] {
      PromptsourceMapper(TemplateRegistry.builtin,
        datasetName = "nope", templateName = "missing")(
        Seq(1L).toDF("id"))
    }
    assert(e.getMessage.contains("dataset=nope"))
  }

  test("include: registry resolution, nesting, shared scope, cycles") {
    val incs = Map(
      "header" -> "== {{ title }} ==",
      "outer" -> "[{% include \"header\" %}]",
      "a" -> "{% include 'b' %}",
      "b" -> "{% include 'a' %}")
    // inline at the include site, enclosing variables visible
    assert(MiniJinja.parse("{% include \"header\" %} body", incs)
      .render(Map("title" -> "T")) == "== T == body")
    // nested includes resolve through the same registry
    assert(MiniJinja.parse("{% include 'outer' %}", incs)
      .render(Map("title" -> "X")) == "[== X ==]")
    // unknown name lists what IS registered
    val eU = intercept[IllegalArgumentException] {
      MiniJinja.parse("{% include 'nope' %}", incs)
    }
    assert(eU.getMessage.contains("nope") && eU.getMessage.contains("header"))
    // cycles reject at parse time with the chain
    val eC = intercept[IllegalArgumentException] {
      MiniJinja.parse("{% include 'a' %}", incs)
    }
    assert(eC.getMessage.contains("cycle"))
  }

  test("PromptsourceMapper resolves includes against its registry") {
    val reg = TemplateRegistry(
      templates = Map(
        ("d", "", "frag") -> "<<{{ x }}>>",
        ("d", "", "main") -> "pre {% include \"frag\" %} ||| {{ x }}",
        ("other", "s", "main") ->
          "q {% include 'd/frag' %} ||| ok"),
      answerChoices = Map.empty)
    val df = Seq((1L, "v")).toDF("id", "x")
    val out = PromptsourceMapper(reg, datasetName = "d",
      templateName = "main")(df)
      .select("source", "target").as[(String, String)].head()
    assert(out == (("pre <<v>>", "v")))
    // cross-dataset include via the fully-qualified name
    val out2 = PromptsourceMapper(reg, datasetName = "other",
      subsetName = "s", templateName = "main")(df)
      .select("source").as[String].head()
    assert(out2 == "q <<v>>")
  }
}

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

  /** Load a user-supplied promptsource `templates.yaml` (the community
    * registry's actual on-disk format — see [[PromptsourceYaml]]). */
  def fromYamlFile(path: String): TemplateRegistry =
    PromptsourceYaml.registryFromString(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"))

  /** Walk a promptsource checkout's `templates/` tree:
    * `<dataset>[/<subset>]/templates.yaml`, each parsed with
    * [[PromptsourceYaml]] and merged into one registry. */
  def fromYamlDirectory(root: String): TemplateRegistry = {
    val rootF = new java.io.File(root)
    val yamls = for {
      ds <- Option(rootF.listFiles()).getOrElse(Array.empty).toSeq
        if ds.isDirectory
      f <- ds.listFiles().toSeq.flatMap { e =>
        if (e.isDirectory)
          Option(e.listFiles()).getOrElse(Array.empty).toSeq
            .filter(_.getName == "templates.yaml")
        else if (e.getName == "templates.yaml") Seq(e)
        else Seq.empty
      }
    } yield f
    merged(yamls.map(f => PromptsourceYaml.registryFromString(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))))
  }

  /** Per-template merge, later registries winning: a later registry
    * redefining (dataset,subset,name) WITHOUT answer_choices must also
    * evict the earlier one's stale answerChoices for that key, or the
    * old choices would pair with the new jinja. */
  def merged(regs: Seq[TemplateRegistry]): TemplateRegistry =
    regs.foldLeft(TemplateRegistry(Map.empty)) { (acc, r) =>
      TemplateRegistry(acc.templates ++ r.templates,
        (acc.answerChoices -- r.templates.keySet) ++ r.answerChoices)
    }

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
      registry.lookupChoices(datasetName, subsetName, templateName),
    // {% include %} resolution: same-(dataset,subset) templates by bare
    // name, everything by the fully-qualified "dataset/subset/name"
    includeTemplates = registry.templates.map {
      case ((ds, sub, name), src) =>
        (if (sub.isEmpty) s"$ds/$name" else s"$ds/$sub/$name") -> src
    } ++ registry.templates.collect {
      case ((ds, sub, name), src)
          if ds == datasetName && sub == subsetName && name != templateName =>
        name -> src
    }
  )
  override def outputFields: Seq[String] = inner.outputFields
  override protected def build(df: DataFrame): DataFrame = inner(df)
}

/** Parser for the promptsource community registry's on-disk template
  * format — the `templates.yaml` files the reference resolves through
  * the promptsource package (promptsource.py:239-310; upstream store:
  * bigscience-workshop/promptsource, `templates/<dataset>[/<subset>]/
  * templates.yaml`). With this, a user-supplied YAML file loads into
  * [[TemplateRegistry]] directly — no more hand-ported Scala literals.
  *
  * The format is a narrow YAML subset, parsed natively (no YAML
  * dependency is available offline, and none is needed for this shape):
  *
  * {{{
  * dataset: glue
  * subset: mrpc            # optional
  * templates:
  *   <uuid>: !Template
  *     answer_choices: not equivalent ||| equivalent   # or null
  *     id: <uuid>
  *     jinja: 'Does ... {{sentence1}}
  *
  *       {{sentence2}} ||| {{answer_choices[label]}}'
  *     metadata: !TemplateMetadata   # nested block — skipped
  *       choices_in_prompt: false
  *     name: equivalent
  *     reference: ''
  * }}}
  *
  * Scalar styles handled per YAML flow rules, because the store uses
  * all of them: PLAIN (with continuation folding), SINGLE-QUOTED
  * (doubled quote = literal quote; line breaks FOLD — one break →
  * space, n breaks → n−1 newlines, surrounding indentation stripped),
  * DOUBLE-QUOTED (backslash escapes incl. newline/tab/quote/backslash
  * and 4-hex unicode; same folding), and LITERAL/FOLDED BLOCKS
  * (pipe / greater-than headers with clip and strip chomping).
  * Unknown per-template keys and the metadata subtree are skipped
  * structurally (by indent), so upstream additions don't break
  * loading. */
object PromptsourceYaml {

  final case class ParsedTemplate(
      name: String,
      jinja: String,
      answerChoices: Option[String])

  final case class ParsedFile(
      dataset: String,
      subset: String,
      templates: Seq[ParsedTemplate])

  /** Parse one templates.yaml document. */
  def parse(content: String): ParsedFile = {
    val lines = content.replace("\r\n", "\n").split("\n", -1).toIndexedSeq
    def indentOf(s: String): Int = s.takeWhile(_ == ' ').length
    def isBlank(s: String): Boolean = s.trim.isEmpty || s.trim.startsWith("#")

    // --- scalar readers -------------------------------------------------
    // Each returns (value, indexOfNextUnconsumedLine). `rest` is the text
    // on the key's own line after "key:".

    /** YAML flow folding over raw line fragments: 1 break → space,
      * n breaks → n−1 newlines; fragment edges already trimmed. */
    def fold(fragments: Seq[String]): String = {
      val sb = new StringBuilder(fragments.headOption.getOrElse(""))
      var pendingBreaks = 0
      fragments.drop(1).foreach { frag =>
        if (frag.isEmpty) pendingBreaks += 1
        else {
          sb.append(if (pendingBreaks == 0) " " else "\n" * pendingBreaks)
          sb.append(frag)
          pendingBreaks = 0
        }
      }
      if (pendingBreaks > 0) sb.append("\n" * pendingBreaks)
      sb.toString
    }

    /** Quoted scalar: consume from `first` (text after the opening
      * quote) across lines until the closing quote. Returns fold-ready
      * per-line fragments and the next line index. */
    def readQuoted(first: String, firstIdx: Int, quote: Char)
        : (Seq[String], Int) = {
      val frags = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur = new StringBuilder
      var i = firstIdx
      var line = first
      var pos = 0
      var done = false
      var isFirstLine = true
      def flushFrag(): Unit = {
        frags += (if (isFirstLine) cur.toString
          else cur.toString.replaceAll("^\\s+", ""))
        cur = new StringBuilder
      }
      while (!done) {
        if (pos >= line.length) {
          // line exhausted without the closing quote: continuation
          cur = new StringBuilder(cur.toString.replaceAll("\\s+$", ""))
          flushFrag()
          isFirstLine = false
          i += 1
          require(i < lines.length, s"unterminated $quote-quoted scalar")
          line = lines(i)
          pos = indentOf(line)
        } else {
          val c = line.charAt(pos)
          if (quote == '\'' && c == '\'') {
            if (pos + 1 < line.length && line.charAt(pos + 1) == '\'') {
              cur.append('\''); pos += 2
            } else { done = true; pos += 1 }
          } else if (quote == '"' && c == '\\') {
            require(pos + 1 < line.length,
              "escaped line breaks in double-quoted scalars not supported")
            line.charAt(pos + 1) match {
              case 'n' => cur.append('\n'); pos += 2
              case 't' => cur.append('\t'); pos += 2
              case 'r' => cur.append('\r'); pos += 2
              case '"' => cur.append('"'); pos += 2
              case '\\' => cur.append('\\'); pos += 2
              case '\'' => cur.append('\''); pos += 2
              case 'u' =>
                cur.append(Integer.parseInt(
                  line.substring(pos + 2, pos + 6), 16).toChar)
                pos += 6
              case other =>
                throw new IllegalArgumentException(
                  s"unsupported escape \\$other in double-quoted scalar")
            }
          } else if (quote == '"' && c == '"') { done = true; pos += 1 }
          else { cur.append(c); pos += 1 }
        }
      }
      flushFrag()
      (frags.toSeq, i + 1)
    }

    /** Literal (|) / folded (>) block scalar. */
    def readBlock(header: String, keyIndent: Int, startIdx: Int)
        : (String, Int) = {
      val folded = header.startsWith(">")
      val chomp = header.drop(1).headOption // Some('-')/Some('+')/None
      var i = startIdx
      val body = scala.collection.mutable.ArrayBuffer.empty[String]
      var blockIndent = -1
      var continue = true
      while (continue && i < lines.length) {
        val l = lines(i)
        if (l.trim.isEmpty) { body += ""; i += 1 }
        else if (indentOf(l) > keyIndent) {
          if (blockIndent < 0) blockIndent = indentOf(l)
          body += l.drop(blockIndent)
          i += 1
        } else continue = false
      }
      while (body.nonEmpty && body.last.isEmpty && !chomp.contains('+'))
        body.remove(body.length - 1)
      val text =
        if (folded) fold(body.toSeq)
        else body.mkString("\n")
      val out = chomp match {
        case Some('-') => text
        case _ => text + "\n" // clip (default) and keep: one trailing break
      }
      (out, i)
    }

    /** Plain scalar with continuation folding. */
    def readPlain(rest: String, keyIndent: Int, startIdx: Int)
        : (String, Int) = {
      val frags = scala.collection.mutable.ArrayBuffer(rest.trim)
      var i = startIdx
      var continue = true
      while (continue && i < lines.length) {
        val l = lines(i)
        if (l.trim.isEmpty) { frags += ""; i += 1 }
        else if (indentOf(l) > keyIndent && !l.trim.startsWith("- ") &&
          !l.contains(": ") && !l.trim.endsWith(":")) {
          frags += l.trim; i += 1
        } else continue = false
      }
      while (frags.nonEmpty && frags.last.isEmpty) frags.remove(frags.length - 1)
      (fold(frags.toSeq), i)
    }

    /** Dispatch on the first character of the value. */
    def readScalar(rest: String, keyIndent: Int, nextIdx: Int)
        : (String, Int) = {
      val t = rest.trim
      if (t.startsWith("'")) {
        // locate the opening quote on the key line so column math
        // stays on the ORIGINAL line (indentation is significant)
        val keyLine = lines(nextIdx - 1)
        val open = keyLine.indexOf('\'')
        val (frags, ni) =
          readQuoted(keyLine.substring(open + 1), nextIdx - 1, '\'')
        (fold(frags), ni)
      } else if (t.startsWith("\"")) {
        val keyLine = lines(nextIdx - 1)
        val open = keyLine.indexOf('"')
        val (frags, ni) =
          readQuoted(keyLine.substring(open + 1), nextIdx - 1, '"')
        (fold(frags), ni)
      } else if (t.startsWith("|") || t.startsWith(">")) {
        readBlock(t, keyIndent, nextIdx)
      } else readPlain(t, keyIndent, nextIdx)
    }

    // --- document walk --------------------------------------------------
    var dataset = ""
    var subset = ""
    val out = scala.collection.mutable.ArrayBuffer.empty[ParsedTemplate]
    var i = 0
    var inTemplates = false
    var curName: Option[String] = None
    var curJinja: Option[String] = None
    var curChoices: Option[String] = None
    var sawTemplate = false
    def flush(): Unit = {
      if (sawTemplate) (curName, curJinja) match {
        case (Some(n), Some(j)) => out += ParsedTemplate(n, j, curChoices)
        case (Some(n), None) =>
          throw new IllegalArgumentException(s"template '$n' has no jinja")
        case (None, _) =>
          throw new IllegalArgumentException("template block has no name")
      }
      curName = None; curJinja = None; curChoices = None
      sawTemplate = false
    }
    while (i < lines.length) {
      val l = lines(i)
      if (isBlank(l)) i += 1
      else {
        val ind = indentOf(l)
        val t = l.trim
        if (ind == 0) {
          flush()
          inTemplates = false
          if (t.startsWith("dataset:")) {
            val (v, ni) = readScalar(t.stripPrefix("dataset:"), 0, i + 1)
            dataset = v; i = ni
          } else if (t.startsWith("subset:")) {
            val (v, ni) = readScalar(t.stripPrefix("subset:"), 0, i + 1)
            subset = v; i = ni
          } else if (t == "templates:") { inTemplates = true; i += 1 }
          else i += 1 // unknown top-level key; its value lines are indented
        } else if (inTemplates && ind == 2 && t.endsWith("!Template")) {
          flush(); sawTemplate = true; i += 1
        } else if (inTemplates && ind == 4 && sawTemplate && t.contains(":")) {
          val key = t.takeWhile(_ != ':')
          val rest = t.drop(key.length + 1)
          key match {
            case "jinja" =>
              val (v, ni) = readScalar(rest, 4, i + 1)
              curJinja = Some(v); i = ni
            case "name" =>
              val (v, ni) = readScalar(rest, 4, i + 1)
              curName = Some(v); i = ni
            case "answer_choices" =>
              val (v, ni) = readScalar(rest, 4, i + 1)
              curChoices =
                if (v == "null" || v.isEmpty) None else Some(v)
              i = ni
            case _ =>
              // id / reference / metadata (incl. its !TemplateMetadata
              // subtree) / future keys: consume the value structurally
              i += 1
              while (i < lines.length && (isBlank(lines(i)) ||
                indentOf(lines(i)) > 4)) i += 1
          }
        } else i += 1
      }
    }
    flush()
    require(dataset.nonEmpty, "templates.yaml has no `dataset:` key")
    ParsedFile(dataset, subset, out.toSeq)
  }

  /** Parse + index into a [[TemplateRegistry]]. */
  def registryFromString(content: String): TemplateRegistry = {
    val f = parse(content)
    TemplateRegistry(
      f.templates.map(t =>
        (f.dataset, f.subset, t.name) -> t.jinja).toMap,
      f.templates.flatMap(t =>
        t.answerChoices.map((f.dataset, f.subset, t.name) -> _)).toMap)
  }
}

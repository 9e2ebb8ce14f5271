package graft

import graft.operators._
import graft.recipes.Recipes
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the real testdata: read →
  * dedup → quality-filter → template → tokenize → batch → collate →
  * hand off. The flagship integration the reference's examples/ dir
  * implies (SURVEY §5 plan item 4). */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Map[String, Long] = (
    Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++
      "abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "abcdefghijklmnopqrstuvwxyz".map("##" + _) ++
      Seq("table", "scan", "fast", "query", "value", "the", "spark", "agg",
        "row", "key", "##s", "##er")
  ).zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
  private val tok = WordPieceTokenizer(vocab)

  test("full corpus pipeline: dedup -> filter -> tokenize -> collate") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("words", split(col("text"), " "))

    // 1. near-dedup + exact dedup
    val deduped = MinHashLSH.dedup(
      ExactDedup("text", "doc_id")(docs),
      "words", "doc_id", minJaccard = 0.9)
    assert(deduped.count() > 0 && deduped.count() <= docs.count())

    // 2. quality filter: keep docs with >= 20 words
    val filtered = operators.Filter("n_chars", ">", 100)(deduped)
      .filter(size(col("words")) >= 20)

    // 3. language annotation
    val annotated = filtered.withColumn("pred_lang", TextAnalysis.langId(col("words")))

    // 4. prompt + tokenize via the jinja recipe
    val tokenized = Recipes.jinja(
      tok,
      "{{ text }}|||{{ lang }}",
      maxLength = Some(64)
    )(annotated)
    val lens = tokenized.select(size(col("input_ids"))).as[Int].collect()
    assert(lens.nonEmpty && lens.forall(l => l > 0 && l <= 64))

    // 5. batch + collate to rectangles
    val collated = Recipes.collator(tok, batchSize = 8)(
      tokenized.withColumn("k", monotonically_increasing_id())
        .select("k", "input_ids", "attention_mask", "labels")
    )
    val batches = collated.select("input_ids").as[Seq[Seq[Long]]].collect()
    assert(batches.nonEmpty)
    batches.foreach(b => assert(b.map(_.size).distinct.size == 1))

    // 6. hand-off boundary streams rows without driver blowup
    val it = MlHandoff.toLocalRowIterator(collated.limit(2))
    assert(it.hasNext)
  }

  test("tokenizer overflow: windows cover the body, mapping is ordinal") {
    val df = Seq("this is a long text " * 10).toDF("text")
    val out = TokenizerMapper(
      WordPieceTokenizer(vocab),
      "text",
      maxLength = Some(16),
      returnOverflowingTokens = true,
      strideOverlap = 2
    )(df)
    val rows2 = out
      .select("overflow_to_sample_mapping", "input_ids")
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(rows2.length > 1)
    assert(rows2.map(_._1).toSeq == rows2.indices.map(_.toLong))
    rows2.foreach { case (_, ids) =>
      assert(ids.size <= 16)
      assert(ids.head == vocab("[CLS]") && ids.last == vocab("[SEP]"))
    }
    // consecutive windows overlap by strideOverlap body tokens
    val b0 = rows2(0)._2.drop(1).dropRight(1)
    val b1 = rows2(1)._2.drop(1).dropRight(1)
    assert(b0.takeRight(2) == b1.take(2))
  }

  test("release pipeline: redact -> blocklist -> boilerplate -> CDC chunk " +
    "dedup -> snapshot diff") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(21)
    def para() = (0 until 40)
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = para() + " " + para() // content reused across docs
    val docs = (0L until 6L).map { i =>
      val own = para() + " " + para()
      val secret = if (i % 2 == 0) " password123 " else " "
      (i, s"$shared$secret$own\nCOMMON FOOTER")
    }.toDF("doc_id", "text")
    // 1. redact + blocklist audit
    val redacted = PhraseBlocklist(Seq("password123"))(
      PhraseReplace(Seq("password123"), "[X]")(docs))
    assert(redacted.filter(col("phrase_hit")).count() == 0) // redacted first
    assert(redacted.filter(col("text").contains("[X]")).count() == 3)
    // 2. boilerplate footer removal (6 occurrences >= 3)
    val clean = BoilerplateLines("text", "doc_id", "\n", minCount = 3)(
      redacted.select("doc_id", "text"))
    assert(clean.filter(col("text").contains("COMMON FOOTER")).count() == 0)
    // 3. CDC chunks + exact chunk dedup find the shared prefix content
    val chunks = CdcChunker("text", "chunk")(clean)
    val dupChunks = chunks.groupBy("chunk").count().filter(col("count") > 1)
    assert(dupChunks.count() > 0, "shared content must yield shared chunks")
    // 4. release diff vs the unredacted snapshot: the footer removal
    // touched every doc (redaction additionally changed the even ones)
    val diff = SnapshotDiff.diff(docs, clean, Seq("doc_id"), Seq("text"),
      includeUnchanged = true)
    val changed = diff.filter(col("change") === "changed").count()
    assert(changed == 6)
  }
}

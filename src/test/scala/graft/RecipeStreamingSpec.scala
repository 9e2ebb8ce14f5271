package graft

import graft.operators._
import graft.recipes.Recipes
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Recipes (pipeline factories) + Structured Streaming. */
class RecipeStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Map[String, Long] = (
    Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "q", ":", "a", "what", "is",
      "spark", "fast", "engine", "yes", "no") ++
      "abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "abcdefghijklmnopqrstuvwxyz".map("##" + _)
  ).zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
  private val tok = WordPieceTokenizer(vocab)

  test("prompting recipe: encode -> truncate -> fill, budget respected") {
    val df = Seq(("what is spark", "yes")).toDF("question", "answer")
    val p = Recipes.prompting(
      tok, "q : {question} a : {answer}",
      fieldsToTruncate = Seq("question"), maxLength = 12)
    val out = p(df)
    val ids = out.select("input_ids").as[Seq[Long]].head()
    assert(ids.size <= 12)
    assert(ids.head == vocab("[CLS]") && ids.last == vocab("[SEP]"))
    val am = out.select("attention_mask").as[Seq[Long]].head()
    assert(am.size == ids.size && am.forall(_ == 1L))
  }

  test("jinja recipe end-to-end: source/labels token columns") {
    val df = Seq(("what is spark", "fast engine")).toDF("q", "a")
    val p = Recipes.jinja(tok, "{{ q }}?|||{{ a }}")
    val out = p(df)
    assert(out.columns.toSeq == Seq("input_ids", "attention_mask", "labels"))
    val labels = out.select("labels").as[Seq[Long]].head()
    assert(labels == Seq(vocab("fast"), vocab("engine")))
  }

  test("collator recipe: rectangular padded batches") {
    val df = Seq(
      (1L, Seq(5L, 6L)), (2L, Seq(7L)), (3L, Seq(8L, 9L, 10L)), (4L, Seq(11L))
    ).toDF("id", "input_ids")
    val out = Recipes.collator(tok, batchSize = 2, orderBy = Seq("id"))(
      df.drop("id").withColumn("id", col("input_ids")(0))
        .select("id", "input_ids")
    )
    val batches = out.select("input_ids").as[Seq[Seq[Long]]].collect()
    batches.foreach(b => assert(b.map(_.size).distinct.size == 1))
  }

  test("squad prompting recipe end-to-end") {
    val sq = Seq(
      (Seq("spark is fast and good", "it runs on clusters"),
        Seq("fast"), "yes"),
      (Seq("totally unrelated text here", "nothing to see"),
        Seq("zzz absent"), "no")
    ).toDF("context", "evidences", "answer")
    val p = Recipes.squadPrompting(tok, template = "q : {context}",
      maxContextLength = 32)
    val out = p(sq)
    assert(out.count() >= 2)
    val cols = out.columns.toSet
    assert(cols.contains("input_ids") && cols.contains("labels"))
    val ids = out.select("input_ids").as[Seq[Long]].collect()
    ids.foreach { s => assert(s.head == tok.bosIds.head && s.last == tok.eosIds.head) }
  }

  test("narrow mappers run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val pipeline = Pipeline(
      Vector(
        RenameFields(Map("value" -> "text")),
        TextToWords(Seq("text"), Splitters.Ws),
        MakeField("n", 0L, shapeLike = Some("text"))
      )
    )
    val out = StreamingPipeline(pipeline, mem.toDF())
    val q = out.writeStream.format("memory").queryName("graft_stream_t1")
      .outputMode("append").start()
    mem.addData("a b c", "d e")
    q.processAllAvailable()
    val got = spark.sql("SELECT * FROM graft_stream_t1").collect()
    assert(got.length == 2)
    assert(got.map(_.getSeq[String](0).size).sorted.toSeq == Seq(2, 3))
    q.stop()
  }

  test("round-9 narrow ops stream unchanged: redact, mask, corrupt, hash") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val pipeline = Pipeline(
      Vector(
        RenameFields(Map("_1" -> "doc_id", "_2" -> "text")),
        PhraseBlocklist(Seq("bad phrase")),
        PhraseReplace(Seq("secret"), "[X]"),
        TextToWords(Seq("text"), Splitters.Ws)
      )
    )
    val out = StreamingPipeline(pipeline, mem.toDF())
    val withMasks = MlmMasking("ids", "doc_id")(
      SpanCorruption("ids", "doc_id")(
        out.withColumn("ids",
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.col("text"),
            w => org.apache.spark.sql.functions.length(w)
              .cast("long")))))
    val q = withMasks.writeStream.format("memory")
      .queryName("graft_stream_r9").outputMode("append").start()
    mem.addData((1L, "a secret bad phrase here"), (2L, "clean text"))
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT doc_id, phrase_hit, inputs, labels FROM graft_stream_r9")
      .collect().sortBy(_.getLong(0))
    assert(got.length == 2)
    assert(got(0).getBoolean(1) && !got(1).getBoolean(1))
    assert(got.forall(r => r.getSeq[Long](2).nonEmpty &&
      r.getSeq[Long](3).nonEmpty))
    q.stop()
  }

  test("streaming HLL sketches: windowed distinct estimates with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(Long, String)]
    val events = mem.toDF().toDF("sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
    // the incremental-profiling shape on a stream: per-window mergeable
    // sketches; the estimate is exact at these cardinalities
    val agg = events
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"))).as("nd"),
        count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("graft_stream_hll")
      .outputMode("update").start()
    mem.addData((0L until 30L).map(i => (i, s"u${i % 7}")): _*)
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT n, nd FROM graft_stream_hll ORDER BY n DESC LIMIT 1")
      .collect().head
    assert(got.getLong(0) == 30L && got.getLong(1) == 7L, got.toString)
    q.stop()
  }

  test("BPE tokenization runs unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val tok = BytePairTokenizer.fromMerges(Seq(("t", "h"), ("th", "e")))
    val pipeline = Pipeline(Vector(
      RenameFields(Map("value" -> "text")),
      TokenizerMapper(tok, "text", addSpecialTokens = false,
        returnAttentionMask = false, returnLength = true)
    ))
    val out = StreamingPipeline(pipeline, mem.toDF())
    val q = out.writeStream.format("memory").queryName("graft_stream_bpe")
      .outputMode("append").start()
    mem.addData("the theme", "x")
    q.processAllAvailable()
    val got = spark.sql("SELECT length FROM graft_stream_bpe").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got.size == 2 && got.head >= 1)
    q.stop()
  }

  test("streaming sessionize: gap sessions close by next event or watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val out = StreamingPipeline.sessionize(
      mem.toDF().toDF("user", "ts"), "ts", "user",
      gapSeconds = 30L, watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("graft_stream_sess")
      .outputMode("append").start()
    // ONE batch holding two sessions for A: [1000s,1010s] then an open
    // [1100s] (times sit above the initial zero watermark, which drops
    // t<=0 rows as late data)
    mem.addData(("A", ts(1000)), ("A", ts(1010)), ("A", ts(1100)))
    q.processAllAvailable()
    val got1 = spark.sql(
      "SELECT key, session_start, session_end, n_events FROM graft_stream_sess")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the closed session emits immediately; the open one stays in state
    assert(got1 == Set(("A", 1000000L, 1010000L, 2L)))
    // push the watermark far past 1100s+gap: A's open session times out
    mem.addData(("B", ts(2500)))
    q.processAllAvailable()
    mem.addData(("B", ts(2501))) // extra batch so the timeout fires
    q.processAllAvailable()
    val got2 = spark.sql(
      "SELECT key, session_start, n_events FROM graft_stream_sess").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2.contains(("A", 1100000L, 1L)), got2)
    // B's session is still open (events 500,501 within gap): not emitted
    assert(!got2.exists(_._1 == "B"))
    q.stop()
  }

  test("Gopher gate + deterministic sample run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // both ops are row-local predicates/projections: stream-safe by
    // construction, no state, no watermark needed
    val mapped = Pipeline(Vector(
      RenameFields(Map("_1" -> "doc_id", "_2" -> "text"))
    ))
    val withCols = StreamingPipeline(mapped, mem.toDF())
      .withColumn("words",
        filter(split(col("text"), "\\s+"), w => w =!= lit("")))
    // char-fraction bounds relaxed: a 6-word doc legitimately fails the
    // long-document n-gram rules (gate logic is pinned in
    // DedupContribSpec; THIS test pins stream-safety)
    val gated = GopherQualityFilter("text", "words",
      GopherQuality.Config(minWords = 4, minStopwordHits = 0,
        minAlphaWordRatio = 0.0, maxTopBigramCharFraction = 1.0,
        maxTopTrigramCharFraction = 1.0, maxDup5gramCharFraction = 1.0),
      keepOnly = true)(withCols)
    val sampled = DeterministicSample("doc_id", fraction = 1.0)(gated)
    val q = sampled.writeStream.format("memory").queryName("graft_stream_gq")
      .outputMode("append").start()
    mem.addData((1L, "the quick brown fox jumps clean"), (2L, "too short"))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id FROM graft_stream_gq").collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(1L)) // short doc gated out; sampler at 1.0 keeps all
    q.stop()
  }

  test("order-sensitive stages rejected on streams") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val err = intercept[IllegalArgumentException] {
      StreamingPipeline(
        Pipeline(Vector(FixedBatchSize(2, orderBy = Seq("value")))),
        mem.toDF()
      )
    }
    assert(err.getMessage.contains("order-sensitive"))
  }

  test("windowed counts with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingPipeline.windowedCounts(
      mem.toDF().toDF("ts", "k"), "ts", "k")
    val q = out.writeStream.format("memory").queryName("graft_stream_t2")
      .outputMode("update").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
    mem.addData((t0, "x"), (t1, "x"), (t0, "y"))
    q.processAllAvailable()
    val got = spark.sql("SELECT k, n FROM graft_stream_t2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L))
    q.stop()
  }

  test("streaming pipeline writes parquet with checkpointing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val out = StreamingPipeline(
      Pipeline(Vector(
        RenameFields(Map("value" -> "text")),
        TextToWords(Seq("text"), Splitters.Ws)
      )),
      mem.toDF()
    )
    val q = out.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    mem.addData("a b", "c d e")
    q.processAllAvailable()
    mem.addData("f")
    q.processAllAvailable()
    q.stop()
    val read = spark.read.parquet(outDir)
    assert(read.count() == 3)
    assert(read.schema("text").dataType.typeName == "array")
  }

  test("streaming dedup emits first occurrence per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPipeline.streamingDedup(mem.toDF().toDF("id", "h"), "h")
    val q = out.writeStream.format("memory").queryName("graft_stream_t3")
      .outputMode("append").start()
    mem.addData((1L, "aa"), (2L, "aa"), (3L, "bb"))
    q.processAllAvailable()
    mem.addData((4L, "aa"), (5L, "cc"))
    q.processAllAvailable()
    val got = spark.sql("SELECT h FROM graft_stream_t3").collect().map(_.getString(0))
    assert(got.sorted.toSeq == Seq("aa", "bb", "cc"))
    q.stop()
  }

  test("streamingNearDup flags cross-batch near-dups via the durable sig store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_snd").toString
    val mem = MemoryStream[(Long, Seq[String])]
    val results = collection.concurrent.TrieMap.empty[Long, Boolean]
    val q = StreamingPipeline.streamingNearDup(
      mem.toDF().toDF("doc_id", "words"),
      sigStoreDir = s"$dir/store", checkpointDir = s"$dir/ckpt",
      idField = "doc_id",
      onBatch = (df, _) =>
        df.select("doc_id", "dup_of_existing").as[(Long, Boolean)]
          .collect().foreach { case (id, f) => results(id) = f }
    )
    val a = (1 to 10).map(i => s"alpha$i")
    val b = (1 to 10).map(i => s"beta$i")
    val c = (1 to 10).map(i => s"gamma$i")
    mem.addData((1L, a), (2L, b))
    q.processAllAvailable()
    // first epoch: nothing persisted before it, nothing can be a dup
    assert(results.toMap == Map(1L -> false, 2L -> false))
    // 9/11 shared words with doc 1 (jaccard 0.82) -> dup; fresh doc -> not
    mem.addData((3L, a.take(9) :+ "alphaNEW"), (4L, c))
    q.processAllAvailable()
    assert(results(3L) && !results(4L), results.toMap)
    // the store grew one epoch dir per batch
    val epochs = new java.io.File(s"$dir/store").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.length == 2, epochs.toSeq)
    q.stop()
  }

  test("streamingSeenFilter: durable Bloom store flags re-crawled values") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sbf").toString
    val mem = MemoryStream[(Long, String)]
    val results = collection.concurrent.TrieMap.empty[Long, Boolean]
    val q = StreamingPipeline.streamingSeenFilter(
      mem.toDF().toDF("id", "url"),
      filterStoreDir = s"$dir/store", checkpointDir = s"$dir/ckpt",
      valueField = "url", mBits = 1008, k = 3,
      onBatch = (df, _) =>
        df.select("id", "might_have_seen").as[(Long, Boolean)]
          .collect().foreach { case (id, f) => results(id) = f }
    )
    mem.addData((1L, "http://a.example/x"), (2L, "http://b.example/y"))
    q.processAllAvailable()
    assert(results.toMap == Map(1L -> false, 2L -> false))
    // batch 2: one re-crawl (guaranteed flagged), one fresh URL
    mem.addData((3L, "http://a.example/x"), (4L, "http://c.example/z"))
    q.processAllAvailable()
    assert(results(3L), "a re-crawled value can never be missed")
    assert(!results(4L), "fresh URL false-positived (possible but ~0.1%)")
    // batch 3 still sees batch-1 AND batch-2 values through the merge
    mem.addData((5L, "http://b.example/y"), (6L, "http://c.example/z"))
    q.processAllAvailable()
    assert(results(5L) && results(6L), results.toMap)
    val epochs = new java.io.File(s"$dir/store").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.length == 3, epochs.toSeq)
    q.stop()
  }

  test("seenFilter: zero-row prior epochs never swallow the batch") {
    import graft.operators.BloomSketch
    val dir = java.nio.file.Files.createTempDirectory("graft_sbf0").toString
    // a store whose only prior epoch carries ZERO rows (the shape an
    // empty micro-batch used to write): the probe's merge table is
    // empty, and pre-fix the inner join dropped every current row
    BloomSketch.build(
        Seq.empty[(Int, String)].toDF("__bloom_g", "url"),
        Seq("__bloom_g"), "url", 1008, 3)
      .drop("__bloom_g")
      .write.parquet(s"$dir/store/epoch=0")
    val batch = Seq((1L, "http://a.example/x"), (2L, "http://b.example/y"))
      .toDF("id", "url")
    val flagged = StreamingPipeline
      .seenFilterProbe(batch, s"$dir/store", "url", 1008, 3, epochId = 1L)
      .select("id", "might_have_seen").as[(Long, Boolean)].collect().toMap
    assert(flagged == Map(1L -> false, 2L -> false), flagged)
    // and the append leg refuses to write a zero-row epoch at all
    StreamingPipeline.seenFilterAppend(
      Seq.empty[(Long, String)].toDF("id", "url"),
      s"$dir/store", "url", 1008, 3, epochId = 1L)
    assert(!new java.io.File(s"$dir/store/epoch=1").exists())
    // a real epoch still probes true through the same left-join path
    StreamingPipeline.seenFilterAppend(
      batch, s"$dir/store", "url", 1008, 3, epochId = 1L)
    val again = StreamingPipeline
      .seenFilterProbe(
        Seq((3L, "http://a.example/x"), (4L, "http://c.example/z")).toDF("id", "url"),
        s"$dir/store", "url", 1008, 3, epochId = 2L)
      .select("id", "might_have_seen").as[(Long, Boolean)].collect().toMap
    assert(again(3L) && !again(4L), again)
  }
}

class StreamingExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.operators.Expectations

  test("quarantine split runs unchanged on a stream; audit via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val checks = Seq(
      Expectations.notNull("text"),
      Expectations.inRange("n_chars", 1, 100))
    val df = mem.toDF().toDF("id", "text", "n_chars")
    // annotate/filter are narrow projections -> stream-legal as-is
    val (clean, bad) = Expectations.quarantine(df, checks)
    val q1 = clean.writeStream.format("memory").queryName("graft_exp_clean")
      .outputMode("append").start()
    val q2 = bad.writeStream.format("memory").queryName("graft_exp_bad")
      .outputMode("append").start()
    // the per-batch audit (an agg) rides foreachBatch on the micro-batch
    val audits = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q3 = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Expectations.audit(batch, checks)
          .collect()
          .foreach(r => audits.synchronized {
            audits += ((r.getString(0), r.getLong(2)))
          })
        ()
      }
      .start()
    mem.addData((1L, "ok", 5L), (2L, null, 5L), (3L, "long", 500L))
    q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
    assert(spark.sql("SELECT id FROM graft_exp_clean").as[Long].collect()
      .toSet == Set(1L))
    val badRows = spark.sql("SELECT id, violations FROM graft_exp_bad")
      .as[(Long, Seq[String])].collect().toMap
    assert(badRows(2L) == Seq("not_null:text"))
    assert(badRows(3L) == Seq("in_range:n_chars"))
    assert(audits.synchronized(audits.toMap) ==
      Map("not_null:text" -> 1L, "in_range:n_chars" -> 1L))
    q1.stop(); q2.stop(); q3.stop()
  }
}

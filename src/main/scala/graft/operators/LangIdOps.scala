package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Character-n-gram language identification (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization") — the profile method fastText
  * descends from: a language is its ranked top-N character n-grams;
  * a document is classified to the profile minimizing the OUT-OF-PLACE
  * distance (Σ |doc rank − profile rank|, missing grams costing the
  * maximum `topN`). Upgrades the stopword-ratio heuristic (q87) to a
  * real classifier trainable from any labeled slice of the corpus
  * itself — no model file, no UDF, and every rank and distance is an
  * integer, so the full train→classify round trip replays exactly in
  * any engine.
  *
  * Scale shape: training is one n-gram explode + partial-agg count +
  * per-LANGUAGE window (partitioned, #langs-way parallel) truncated to
  * topN — the profile table is O(#langs · topN) rows and broadcasts.
  * Classification explodes each doc's grams once, ranks them with a
  * per-DOC partitioned window (bounded by doc length), joins the tiny
  * profile table on gram, and argmins per doc with a min-of-struct
  * aggregate — no window over the corpus, no driver state beyond the
  * broadcast. */
object LangIdNgram {

  /** Sliding character n-grams of lowercased text (positions are
    * codepoint-based in both Spark and DuckDB). r13: one native pass
    * ([[graft.functions.CharNgramsExpr]]) replaces the HOF tree, which
    * allocated an array of 1-char strings per row and ran an
    * interpreted concat per gram; bit-identical incl. the <n-codepoint
    * empty case and surrogate handling (parity-spec'd against
    * [[charNgramsHof]]). */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.functions.char_ngrams(lower(text), n)

  /** The pre-r13 HOF formulation — parity-spec reference only.
    * Two performance traps shaped it. (1) Any computed child referenced
    * inside a `transform` lambda re-evaluates PER ELEMENT — so the char
    * split is bound as a lambda variable via the single-element-array
    * trick (the Winnowing fix), evaluating `split(lower(text))` exactly
    * once per row. (2) `substr(i, n)` on a string re-scans from the
    * start to find codepoint i (UTF-8 is variable-width), turning a
    * 500-char doc into an O(len²) scan; the char ARRAY makes each gram
    * three O(1) `element_at` probes. */
  private[graft] def charNgramsHof(text: Column, n: Int): Column =
    flatten(transform(array(split(lower(text), "")), ch => grams(ch, n)))

  /** `ch` must be a bound char-array lambda variable (see above). */
  private def grams(ch: Column, n: Int): Column =
    // sequence(1, 0) would generate the DESCENDING [1, 0] — short texts
    // need the explicit empty case
    when(size(ch) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(ch) - (n - 1)),
          i => concat((0 until n).map(k => element_at(ch, i + k)): _*)))

  /** (lang, gram, rank) profile table: each language's `topN` most
    * frequent n-grams, rank 1 = most frequent, ties broken by gram. */
  def trainProfiles(
      df: DataFrame,
      langField: String,
      textField: String,
      topN: Int = 100,
      n: Int = 3
  ): DataFrame = {
    val counts = df
      .select(col(langField).as("lang"),
        explode(charNgrams(col(textField), n)).as("gram"))
      .groupBy("lang", "gram")
      .agg(count(lit(1)).as("__li_c"))
    val w = Window.partitionBy("lang")
      .orderBy(col("__li_c").desc, col("gram"))
    counts
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topN)
      .select("lang", "gram", "rank")
  }

  /** Classify each row: (idField…, pred_lang, dist). Distance =
    * Σ over the doc's own top-`topN` grams of |docRank − profileRank|,
    * with grams absent from a profile costing `topN`; ties in the
    * argmin break toward the lexicographically smaller language.
    * Documents whose text yields NO char n-grams (null/empty text, or
    * shorter than `n`) are kept with `pred_lang = 'und'` and a null
    * `dist` — they never silently disappear from the output.
    *
    * Semantics notes (r13 kernel path, clarified r14): classification
    * is strictly PER ROW — duplicate `idField` values no longer pool
    * their gram counts the way the old `groupBy(__li_id)` formulation
    * did, and `idField` is retained only for signature compatibility
    * (each input row keeps all its columns). Profile rows with a null
    * `lang` or `gram` are dropped before the collect — the old SQL
    * join path silently never matched them (join keys drop nulls), so
    * the classification is unchanged and the driver-side sort can't
    * NPE on a null label. */
  def classify(
      df: DataFrame,
      idField: String,
      textField: String,
      profiles: DataFrame,
      topN: Int = 100,
      n: Int = 3
  ): DataFrame = {
    // r13: the profile table is O(#langs · topN) rows BY CONSTRUCTION
    // (trainProfiles truncates at topN per language), so collect it
    // once and inline it in a row-local native kernel
    // ([[graft.functions.CtClassifyExpr]] — the ivfTopK literal-
    // centroid discipline): gram count, rank, per-language distance
    // and argmin all happen inside one projection. The SQL shape it
    // replaces ([[classifySql]], parity-spec'd) paid a corpus-sized
    // gram explode + (unit, gram) count exchange, a per-unit rank
    // window, a crossJoin with the language list, a broadcast profile
    // join, two aggregations, and a join back to the input — all gone.
    import org.apache.spark.sql.types.{LongType => LT, StringType => ST}
    val rows = profiles
      .select(col("lang").cast(ST), col("gram").cast(ST), col("rank").cast(LT))
      // null lang/gram rows can't match in the old join formulation
      // (equi-join keys drop nulls) — filter them here so the UTF8String
      // sort below never sees a null label
      .filter(col("lang").isNotNull && col("gram").isNotNull)
      .collect()
    if (rows.isEmpty) {
      // empty profile set: the old crossJoin produced no best rows —
      // every doc is 'und' with a null dist
      return df
        .withColumn("pred_lang", lit("und"))
        .withColumn("dist", lit(null).cast(LT))
    }
    val langs = rows.map(_.getString(0)).distinct
      .sortWith((a, b) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0)
    val gramList = rows.map(_.getString(1)).distinct
    val li = langs.zipWithIndex.toMap
    val gi = gramList.zipWithIndex.toMap
    val ranks = Array.fill(gramList.length, langs.length)(-1L)
    rows.foreach { r =>
      ranks(gi(r.getString(1)))(li(r.getString(0))) = r.getLong(2)
    }
    val best = graft.functions.functions.ct_classify(
      lower(col(textField)), n, topN,
      langs.toIndexedSeq, gramList.toIndexedSeq,
      ranks.toIndexedSeq.map(_.toIndexedSeq))
    df.withColumn("__li_b", best)
      .withColumn("pred_lang",
        coalesce(col("__li_b").getField("l"), lit("und")))
      .withColumn("dist", col("__li_b").getField("d"))
      .drop("__li_b")
  }

  /** The pre-r13 SQL formulation of [[classify]] — parity-spec
    * reference only: explode + (unit, gram) count + per-unit rank
    * window, crossJoin langs, broadcast profile join, distance
    * aggregation, argmin, join back. */
  private[graft] def classifySql(
      df: DataFrame,
      idField: String,
      textField: String,
      profiles: DataFrame,
      topN: Int = 100,
      n: Int = 3
  ): DataFrame = {
    val prof = profiles.persist()
    val docTop = docTopSql(df, idField, textField, topN, n)
    val langs = prof.select(col("lang")).distinct()
    val cost = when(col("rank").isNull, lit(topN.toLong))
      .otherwise(abs(col("__li_dr") - col("rank")))
    val best = docTop
      .crossJoin(broadcast(langs))
      .join(broadcast(prof), Seq("gram", "lang"), "left")
      .groupBy("__li_id", "lang")
      .agg(sum(cost).as("__li_dist"))
      .groupBy("__li_id")
      .agg(min(struct(col("__li_dist").as("d"), col("lang").as("l"))).as("__li_b"))
      .select(
        col("__li_id").as(idField),
        col("__li_b.l").as("pred_lang"),
        col("__li_b.d").as("dist"))
    df.join(best, Seq(idField), "left")
      .withColumn("pred_lang", coalesce(col("pred_lang"), lit("und")))
  }

  /** The pre-r13 explode + (unit, gram) count + per-unit window
    * docTop — parity-spec reference only. */
  private[graft] def docTopSql(
      df: DataFrame,
      idField: String,
      textField: String,
      topN: Int,
      n: Int
  ): DataFrame = {
    val docGrams = df
      .select(col(idField).as("__li_id"),
        explode(charNgrams(col(textField), n)).as("gram"))
      .groupBy("__li_id", "gram")
      .agg(count(lit(1)).as("__li_c"))
    val dw = Window.partitionBy("__li_id")
      .orderBy(col("__li_c").desc, col("gram"))
    docGrams
      .withColumn("__li_dr", row_number().over(dw).cast(LongType))
      .filter(col("__li_dr") <= topN)
      .select("__li_id", "gram", "__li_dr")
  }
}

/** Multi-language DOCUMENT SEGMENTATION — the curation step for
  * code-switched web pages: a page that is 80% English with a German
  * boilerplate footer should not be dropped by a document-level
  * language gate, and a bitext-ish page should split into its
  * monolingual spans before per-language routing. Each paragraph
  * (blank-line separated by default) is classified with the
  * [[LangIdNgram]] Cavnar–Trenkle distance, then CONSECUTIVE
  * same-language paragraphs collapse into one segment row:
  * `(id, seg_idx, lang, start_para, n_paras, n_chars)`.
  *
  * Shape at 100 TB: the paragraph explode is linear in corpus bytes;
  * classification is the q218 shape (per-unit gram agg, profile
  * BROADCAST join, one distance aggregation); the run collapse is two
  * windows PARTITIONED by document (per-doc paragraph counts are
  * bounded, never corpus-sized). Empty paragraphs are dropped (their
  * indices remain visible via `start_para` gaps); paragraphs too short
  * to yield an n-gram classify as `und` and form their own segments —
  * they never silently disappear. Deterministic end to end, so a SQL
  * oracle replays paragraphs, distances, argmin, and the collapse
  * exactly. */
object LangSegment {
  import org.apache.spark.sql.expressions.Window

  def segments(
      df: DataFrame,
      idField: String,
      textField: String,
      profiles: DataFrame,
      topN: Int = 100,
      n: Int = 3,
      sep: String = "\n\n"
  ): DataFrame = {
    val paras = df
      .select(col(idField).as("__ls_id"),
        posexplode(split(col(textField),
          java.util.regex.Pattern.quote(sep)))
          .as(Seq("__ls_p", "__ls_para")))
      .filter(length(col("__ls_para")) > 0)
      // r13: carry the paragraph LENGTH, not the paragraph, past
      // classification — n_chars only needs the length, and dropping
      // the text here keeps it out of the collapse windows' shuffles
      .withColumn("__ls_len", length(col("__ls_para")))
      .withColumn("__ls_u", struct(col("__ls_id"), col("__ls_p")))
    val classified = LangIdNgram
      .classify(paras, "__ls_u", "__ls_para", profiles, topN, n)
      .select(col("__ls_id"), col("__ls_p"), col("__ls_len"),
        col("pred_lang"))
    val w = Window.partitionBy("__ls_id").orderBy("__ls_p")
    classified
      .withColumn("__ls_new",
        when(lag(col("pred_lang"), 1).over(w).isNull ||
          lag(col("pred_lang"), 1).over(w) =!= col("pred_lang"), 1L)
          .otherwise(0L))
      .withColumn("seg_idx",
        sum(col("__ls_new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - 1L)
      .groupBy(col("__ls_id"), col("seg_idx"))
      .agg(
        min(col("pred_lang")).as("lang"), // constant within a run
        min(col("__ls_p")).cast(LongType).as("start_para"),
        count(lit(1)).as("n_paras"),
        sum(col("__ls_len")).cast(LongType).as("n_chars"))
      .select(col("__ls_id").as(idField), col("seg_idx"), col("lang"),
        col("start_para"), col("n_paras"), col("n_chars"))
  }
}

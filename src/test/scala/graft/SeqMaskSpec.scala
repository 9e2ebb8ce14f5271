package graft

import graft.operators._

/** Sequence padding / truncation / mask golden cases
  * (reference tests/test_masks.py:11-59, mappers/multiseq.py,
  * mappers/prompting.py:151-310). */
class SeqMaskSpec extends SparkSpec {
  import spark.implicits._

  private val specials = SpecialTokens(Seq(101L), Seq(102L), Seq(103L))

  test("TokensSequencesPadding: bos first, sep between, eos last") {
    val df = Seq(Tuple1(Seq(Seq(1L, 2L), Seq(3L), Seq(4L, 5L)))).toDF("input_ids")
    val out = TokensSequencesPadding("input_ids", specials)(df)
    assert(
      rows(out).head.head == List(
        List(101L, 1L, 2L, 102L),
        List(3L, 102L),
        List(4L, 5L, 103L)
      )
    )
  }

  test("AttentionMaskSequencePadding pads with ones") {
    val df = Seq(Tuple1(Seq(Seq(1L, 1L), Seq(1L)))).toDF("attention_mask")
    val out = AttentionMaskSequencePadding("attention_mask", specials)(df)
    assert(
      rows(out).head.head == List(List(1L, 1L, 1L, 1L), List(1L, 1L))
    )
  }

  test("TokenTypeIdsSequencePadding uses first symbol, suffix only last") {
    val df = Seq(Tuple1(Seq(Seq(0L, 0L), Seq(1L, 1L)))).toDF("token_type_ids")
    val out = TokenTypeIdsSequencePadding("token_type_ids", specials)(df)
    assert(
      rows(out).head.head == List(List(0L, 0L, 0L), List(1L, 1L, 1L, 1L))
    )
  }

  test("MakeAttentionMask ones shaped like input") {
    val df = Seq(Tuple1(Seq(Seq(9L, 9L, 9L), Seq(9L)))).toDF("input_ids")
    val out = MakeAttentionMask()(df)
    assert(
      rows(out.select("attention_mask")).head.head ==
        List(List(1L, 1L, 1L), List(1L))
    )
  }

  test("SingleValueToSequence strategies") {
    val df = Seq((Seq(7L, 8L), Seq(Seq(0L, 0L, 0L), Seq(0L, 0L)))).toDF("y", "input_ids")
    def run(s: String) =
      rows(SingleValueToSequence("y", "input_ids", s)(df).select("y")).head.head
    assert(run("first") == List(List(7L, -100L, -100L), List(8L, -100L)))
    assert(run("last") == List(List(-100L, -100L, 7L), List(-100L, 8L)))
    assert(run("all") == List(List(7L, 7L, 7L), List(8L, 8L)))
  }

  test("Padding pads right, errors when too long") {
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("x")
    assert(
      rows(operators.Padding(4, 0L, Seq("x"))(df)) ==
        Seq(Seq(List(1L, 2L, 0L, 0L)))
    )
    val tooLong = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L))).toDF("x")
    intercept[Exception] {
      operators.Padding(4, 0L, Seq("x"))(tooLong).collect()
    }
  }

  test("TruncateMultipleFields uniform: proportional floor") {
    // reference prompting.py:217-232: lens 8,4 budget 6 → floor(8*6/12)=4, floor(4*6/12)=2
    val df = Seq((Seq.fill(8)(1L), Seq.fill(4)(2L))).toDF("a", "b")
    val out = TruncateMultipleFields(Seq("a", "b"), maxLength = 6, strategy = "uniform")(df)
    val r = rows(out).head
    assert(r(0).asInstanceOf[List[_]].size == 4)
    assert(r(1).asInstanceOf[List[_]].size == 2)
  }

  test("TruncateMultipleFields longest: cuts longest, keeps short") {
    // lens 10,2 budget 8 → target 4; a>target cut to 4+extra, b stays 2
    // extra = 8 - 8 + (4-2) = 2; longer=[6,0]; red_a = 2 → a → 6? no:
    // uniform(longer, 2, 6) = floor(6*2/6)=2 → a = 4+2 = 6, b = 2; total 8
    val df = Seq((Seq.fill(10)(1L), Seq.fill(2)(2L))).toDF("a", "b")
    val out = TruncateMultipleFields(Seq("a", "b"), maxLength = 8, strategy = "longest")(df)
    val r = rows(out).head
    assert(r(0).asInstanceOf[List[_]].size == 6)
    assert(r(1).asInstanceOf[List[_]].size == 2)
  }

  test("TruncateMultipleFields is a no-op under budget") {
    val df = Seq((Seq(1L), Seq(2L))).toDF("a", "b")
    val out = TruncateMultipleFields(Seq("a", "b"), maxLength = 10)(df)
    assert(rows(out) == Seq(Seq(List(1L), List(2L))))
  }

  test("IndicesToMask golden (test_masks.py:11-30 shape)") {
    val df = Seq((Seq(0L, 2L), Seq("a", "b", "c", "d"))).toDF("locs", "ref")
    val out = IndicesToMask("mask", "ref", "locs")(df)
    assert(rows(out.select("mask")).head.head == List(1L, 0L, 1L, 0L))
  }

  test("RangeToMask golden incl. empty locations") {
    val df = Seq(
      (Seq(Seq(1L, 3L)), Seq("a", "b", "c", "d")),
      (Seq.empty[Seq[Long]], Seq("a", "b"))
    ).toDF("locs", "ref")
    val out = RangeToMask("mask", "ref", "locs")(df)
    assert(
      rows(out.select("mask")).map(_.head) ==
        Seq(List(0L, 1L, 1L, 0L), List(0L, 0L))
    )
  }

  test("MaskToIndices + enforce single") {
    val df = Seq(Tuple1(Seq(0L, 1L, 0L, 1L))).toDF("mask")
    assert(
      rows(MaskToIndices("mask", "locs")(df).select("locs")).head.head ==
        List(1L, 3L)
    )
    val single = Seq(Tuple1(Seq(0L, 1L, 0L))).toDF("mask")
    assert(
      rows(
        MaskToIndices("mask", "locs", enforceSingleLocation = true)(single)
          .select("locs")
      ).head.head == 1L
    )
  }

  test("MaskToRange run-length golden (test_masks.py:146-178 semantics)") {
    val df = Seq(Tuple1(Seq(1L, 1L, 0L, 1L, 0L, 1L, 1L, 1L))).toDF("mask")
    val out = MaskToRange("mask", "locs")(df)
    assert(
      rows(out.select("locs")).head.head ==
        List(List(0L, 2L), List(3L, 4L), List(5L, 8L))
    )
  }

  test("ValidUnicode golden (test_tokenize_mappers.py:19-64)") {
    // "\uf02a" is Co (private use); "\u00ad" is Cf (soft hyphen)
    val df = Seq(Tuple1(Seq(
      "This", "example", "has", "bad",
      "\uf02a", "\uf02a\u00ad", "Modalities\uf02a"
    ))).toDF("tokens")
    val out = ValidUnicode(Seq("tokens"),
      Seq("Cc", "Cf", "Co", "Cs", "Mn", "Zl", "Zp", "Zs"), "[UNK]")(df)
    assert(rows(out).head.head == List(
      "This", "example", "has", "bad", "[UNK]", "[UNK]", "Modalities\uf02a"))
  }

  test("mask roundtrip: indices -> mask -> indices") {
    val df = Seq((Seq(1L, 3L, 4L), Seq.fill(6)("x"))).toDF("locs", "ref")
    val out = MaskToIndices("mask", "locs2")(
      IndicesToMask("mask", "ref", "locs")(df)
    )
    assert(rows(out.select("locs2")).head.head == List(1L, 3L, 4L))
  }

  test("SpanCorruption: T5-shape inputs/targets, deterministic, 15% rate") {
    import org.apache.spark.sql.functions._
    val ids = (100L until 140L).toSeq // 40 tokens = 2 full blocks
    val df = Seq((7L, ids)).toDF("doc_id", "ids")
    val run = () => rows(SpanCorruption("ids", "doc_id")(df)
      .select("inputs", "targets")).head
    val Seq(inputs, targets) = run().map(_.asInstanceOf[List[Long]])
    // 2 spans of 3 masked, each replaced by one sentinel
    assert(inputs.length == 40 - 2 * 3 + 2)
    assert(inputs.count(_ >= 32000L) == 2)
    assert(inputs.contains(32099L) && inputs.contains(32098L))
    // targets: sentinel + span per block, then the closing sentinel
    assert(targets.length == 2 * 4 + 1 && targets.last == 32097L)
    assert(targets.head == 32099L && targets(4) == 32098L)
    // masked tokens reappear in targets; nothing is lost overall
    assert((inputs.filter(_ < 32000L) ++ targets.filter(_ < 32000L)).sorted
      == ids.sorted)
    // spans stay inside their blocks
    val span0 = targets.slice(1, 4)
    assert(span0.forall(t => t >= 100L && t < 120L))
    assert(targets.slice(5, 8).forall(t => t >= 120L && t < 140L))
    // pure function: same result on re-run
    assert(run() == Seq(inputs, targets))
    // sequences shorter than one block pass through uncorrupted
    val short = Seq((7L, (0L until 10L).toSeq)).toDF("doc_id", "ids")
    val r = rows(SpanCorruption("ids", "doc_id")(short)
      .select("inputs", "targets")).head
    assert(r == Seq((0L until 10L).toList, List(32099L)))
    // long sequences cap at maxSpans=99 so sentinels never underflow
    // into the real vocabulary (T5 extra ids live in 32000..32099)
    val long = Seq((7L, (40000L until 42100L).toSeq)).toDF("doc_id", "ids")
    val Seq(li, lt) = rows(SpanCorruption("ids", "doc_id")(long)
      .select("inputs", "targets")).head.map(_.asInstanceOf[List[Long]])
    val sent = (li ++ lt).filter(v => v < 40000L)
    assert(sent.forall(s => s >= 32000L && s <= 32099L), s"underflow: ${sent.min}")
    assert(li.count(_ < 40000L) == 99 && lt.last == 32000L)
    // blocks past the cap pass through uncorrupted
    assert(li.takeRight(2100 - 99 * 20) == (40000L + 99 * 20 until 42100L).toList)
  }

  test("MlmMasking: deterministic 80/10/10 at ~15%, labels aligned") {
    import org.apache.spark.sql.functions._
    val n = 4000
    val ids = (0 until n).map(i => 1000L + i % 500)
    val df = Seq((3L, ids)).toDF("doc_id", "ids")
    val run = () => rows(MlmMasking("ids", "doc_id")(df)
      .select("masked_ids", "labels")).head
    val Seq(masked, labels) = run().map(_.asInstanceOf[List[Long]])
    assert(masked.length == n && labels.length == n)
    // selection rate ~15%
    val sel = labels.zipWithIndex.filter(_._1 != -100L).map(_._2)
    assert(math.abs(sel.length.toDouble / n - 0.15) < 0.02, s"rate ${sel.length}")
    // labels carry the ORIGINAL id at selected positions
    sel.foreach(i => assert(labels(i) == ids(i)))
    // unselected positions pass through
    labels.zipWithIndex.filter(_._1 == -100L)
      .foreach { case (_, i) => assert(masked(i) == ids(i)) }
    // branch split: ~80% [MASK]; the 10% keep + 10% random branches both
    // occur; everything stays inside the vocab
    val branches = sel.map(i => masked(i))
    val nMask = branches.count(_ == 103L)
    assert(math.abs(nMask.toDouble / sel.length - 0.8) < 0.06, s"mask $nMask/${sel.length}")
    assert(sel.exists(i => masked(i) == ids(i)))
    assert(branches.forall(v => v >= 0L && v < 30000L))
    // pure function of (key, ids)
    assert(run() == Seq(masked, labels))
  }

  test("TurnMasking: loss on assistant tokens only, alignment structural") {
    val df = Seq(
      (1L, Seq(("system", Seq(1L, 2L)), ("user", Seq(3L)),
        ("assistant", Seq(4L, 5L)), ("user", Seq(6L)),
        ("assistant", Seq(7L)))),
      (2L, Seq(("user", Seq.empty[Long]), ("assistant", Seq(9L)))),
      (3L, Seq.empty[(String, Seq[Long])])
    ).toDF("id", "turns")
      .withColumn("turns",
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.col("turns"),
          t => org.apache.spark.sql.functions.struct(
            t.getField("_1").as("role"), t.getField("_2").as("ids"))))
    val out = rows(TurnMasking("turns")(df).orderBy("id")
      .select("input_ids", "loss_mask"))
    assert(out(0) == Seq(List(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      List(0L, 0L, 0L, 1L, 1L, 0L, 1L)))
    assert(out(1) == Seq(List(9L), List(1L)))
    assert(out(2) == Seq(List(), List()))
    // custom loss roles
    val both = TurnMasking("turns", lossRoles = Set("user", "assistant"))(df)
    assert(rows(both.orderBy("id").select("loss_mask")).head.head ==
      List(0L, 0L, 1L, 1L, 1L, 1L, 1L))
  }

  test("TurnMasking: a turn with null ids is skipped, not conversation-nulling") {
    import org.apache.spark.sql.functions.{col, expr}
    // middle turn has ids = NULL — flatten would null the whole row's
    // output without the pre-filter
    val df = Seq(1L).toDF("id").withColumn("turns", expr(
      """array(named_struct('role','user','ids',array(1L,2L)),
        |      named_struct('role','assistant','ids',cast(null as array<bigint>)),
        |      named_struct('role','assistant','ids',array(5L)))""".stripMargin))
    val out = rows(TurnMasking("turns")(df).select("input_ids", "loss_mask"))
    assert(out.head == Seq(List(1L, 2L, 5L), List(0L, 0L, 1L)))
  }

  test("FimTransform: sentinel layout, token conservation, PSM/SPM mix") {
    import org.apache.spark.sql.functions._
    val ids = (100L until 130L).toSeq
    val sentinels = Set(32001L, 32002L, 32003L)
    val df = (0L until 50L).map(k => (k, ids)).toDF("doc_id", "ids")
    val out = rows(FimTransform("ids", "doc_id")(df)
      .orderBy("doc_id").select("fim_ids"))
      .map(_.head.asInstanceOf[List[Long]])
    out.foreach { fim =>
      // exactly the three sentinels are added; tokens are conserved
      assert(fim.length == ids.length + 3)
      assert(fim.count(sentinels) == 3)
      assert(fim.filterNot(sentinels).sorted == ids)
      // layout: PRE first; PSM = [PRE]..[SUF]..[MID].., SPM = [PRE][SUF]
      assert(fim.head == 32001L)
      val iSuf = fim.indexOf(32003L)
      val iMid = fim.indexOf(32002L)
      assert(iSuf < iMid, s"SUF must precede MID: $fim")
      if (iSuf == 1) {
        // SPM: suffix then [MID] then prefix+middle, all contiguous runs
        assert(fim.slice(2, iMid).forall(!sentinels(_)))
      } else {
        // PSM: prefix between PRE and SUF keeps original order
        assert(fim.slice(1, iSuf) == ids.take(iSuf - 1))
      }
    }
    // both modes occur across keys, roughly half-half at spmRate=50
    val spm = out.count(_.apply(1) == 32003L)
    assert(spm > 10 && spm < 40, s"spm count $spm/50")
    // deterministic
    val again = rows(FimTransform("ids", "doc_id")(df)
      .orderBy("doc_id").select("fim_ids"))
      .map(_.head.asInstanceOf[List[Long]])
    assert(again == out)
    // empty sequence: just the sentinels
    val empty = Seq((1L, Seq.empty[Long])).toDF("doc_id", "ids")
    val e = rows(FimTransform("ids", "doc_id")(empty).select("fim_ids"))
      .head.head.asInstanceOf[List[Long]]
    assert(e.filterNot(sentinels).isEmpty && e.count(sentinels) == 3)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.GaleChurch

class AlignOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cost(a: Seq[Long], b: Seq[Long]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(GaleChurch.alignCost(col("a"), col("b")).as("c"))
      .as[Long].head()

  test("1-1 beads on near-equal lengths: sum of per-sentence gap costs") {
    // mc(100,105)=24 mc(50,48)=20 mc(80,82)=12
    assert(cost(Seq(100L, 50L, 80L), Seq(105L, 48L, 82L)) == 56L)
  }

  test("deletion on one side picks the skip bead, rest still aligns") {
    // skip a1 (450) + mc(50,52)=19 + mc(80,78)=12
    assert(cost(Seq(100L, 50L, 80L), Seq(52L, 78L)) == 481L)
  }

  test("2-1 merge bead beats skip+match when lengths add up") {
    // a=[60,40] vs b=[100]: merge = 230 + mc(100,100)=0; skips = 450+...
    assert(cost(Seq(60L, 40L), Seq(100L)) == 230L)
  }

  test("empty sides degrade to all-skip cost") {
    assert(cost(Seq.empty, Seq(10L, 20L)) == 900L)
    assert(cost(Seq(30L), Seq.empty) == 450L)
    assert(cost(Seq.empty, Seq.empty) == 0L)
  }

  test("sentenceLengths: terminator-delimited non-empty segments") {
    val got = Seq("One two. Three!  Four?").toDF("t")
      .select(GaleChurch.sentenceLengths(col("t")).as("l"))
      .as[Seq[Long]].head()
    assert(got == Seq(7L, 5L, 4L))
  }

  test("scorePairs: aligned pair scores far below a shuffled pair") {
    val df = Seq(
      (1L, Seq(100L, 50L, 80L), Seq(104L, 52L, 81L)),
      (2L, Seq(100L, 50L, 80L), Seq(10L, 300L, 42L))
    ).toDF("id", "src", "tgt")
    val got = GaleChurch.scorePairs(df, "src", "tgt")
      .select("id", "gc_cost_per_bead").as[(Long, Long)].collect().toMap
    assert(got(1L) < 20L && got(2L) > 100L, got.toString)
  }
}

class LcsOverlapSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.LcsOverlap
  import org.apache.spark.sql.functions._

  private def lcs(a: Seq[String], b: Seq[String]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(LcsOverlap.lcsLen(col("a"), col("b")).as("c")).as[Long].head()

  test("classic LCS cases") {
    assert(lcs(Seq("a", "b", "c", "d"), Seq("a", "x", "c", "d")) == 3L)
    assert(lcs(Seq("a", "b", "c"), Seq("c", "b", "a")) == 1L)
    assert(lcs(Seq("a", "b"), Seq("a", "b")) == 2L)
    assert(lcs(Seq.empty, Seq("a")) == 0L)
    assert(lcs(Seq("a"), Seq.empty) == 0L)
  }

  test("non-contiguous in-order overlap is credited (the ROUGE-L point)") {
    // insertion every other word breaks all bigrams but LCS survives
    val a = Seq("the", "cat", "sat", "on", "the", "mat")
    val b = Seq("the", "X", "cat", "Y", "sat", "Z", "on", "W", "the", "V", "mat")
    assert(lcs(a, b) == 6L)
    val got = LcsOverlap.rougeL(Seq((a, b)).toDF("a", "b"), "a", "b")
      .select("rouge_l_f_ppm").as[Long].head()
    assert(got == 2000000L * 6L / 17L)
  }
}

class MarkdownOutlineSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.MarkdownOutline
  import org.apache.spark.sql.functions._

  private val md =
    "preamble\n# Title\nintro line\n\n## Part A\na1\na2\n## Part B\nb1\n### Sub\ns1"

  test("sections: level, title, 0-based line, span, text") {
    val got = MarkdownOutline.sectionize(
        Seq((1L, md)).toDF("doc_id", "text"), "doc_id", "text")
      .select("level", "title", "line_no", "n_lines")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "Title", 1L, 3L),
      (2L, "Part A", 4L, 3L),
      (2L, "Part B", 7L, 2L),
      (3L, "Sub", 9L, 2L)))
    val texts = MarkdownOutline.sectionize(
        Seq((1L, md)).toDF("doc_id", "text"), "doc_id", "text")
      .select("sec_text").as[String].collect().toSeq
    assert(texts.head == "# Title\nintro line\n")
    assert(texts(1) == "## Part A\na1\na2")
  }

  test("no headings -> empty outline; null text safe") {
    val got = Seq((1L, "just text\nno headings"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(size(MarkdownOutline.sections(col("text"))).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0))
    // '#illegal' (no space) is not a heading
    assert(Seq("#nope\n####### seven").toDF("text")
      .select(size(MarkdownOutline.sections(col("text"))).as("n"))
      .as[Int].head() == 0)
  }
}

class RankAgreementSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.RankAgreement
  import org.apache.spark.sql.functions._

  private def rbo(a: Seq[Long], b: Seq[Long]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(RankAgreement.rboPpm(col("a"), col("b")).as("r"))
      .as[Long].head()

  private def tau(x: Seq[Long], y: Seq[Long]): Option[Long] =
    Seq((x, y)).toDF("x", "y")
      .select(RankAgreement.kendallTauPpm(col("x"), col("y")).as("t"))
      .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))

  test("RBO: identical lists = 1 - p^k; disjoint = 0; top swaps cost more") {
    // identical, k=3, p=0.9: (1-p)*sum p^(d-1)*1 = 1 - 0.9^3 = 0.271
    assert(rbo(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 271000L)
    assert(rbo(Seq(1L, 2L, 3L), Seq(7L, 8L, 9L)) == 0L)
    // swapping ranks 1/2 hurts more than swapping 2/3
    val top = rbo(Seq(2L, 1L, 3L), Seq(1L, 2L, 3L))
    val low = rbo(Seq(1L, 3L, 2L), Seq(1L, 2L, 3L))
    assert(top < low && low < 271000L, s"$top $low")
  }

  test("RBO: empty list on either side -> null (explicit, not a " +
    "missing-otherwise accident)") {
    def rboOpt(a: Seq[Long], b: Seq[Long]): Option[Long] =
      Seq((a, b)).toDF("a", "b")
        .select(RankAgreement.rboPpm(col("a"), col("b")).as("r"))
        .collect().headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rboOpt(Seq.empty, Seq(1L, 2L)).isEmpty)
    assert(rboOpt(Seq(1L, 2L), Seq.empty).isEmpty)
    assert(rboOpt(Seq.empty, Seq.empty).isEmpty)
    assert(rboOpt(Seq(1L), Seq(1L)).contains(100000L)) // (1-p)·1 = 0.1
  }

  test("Kendall tau-b: perfect, inverted, and tied cases") {
    assert(tau(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)).contains(1000000L))
    assert(tau(Seq(1L, 2L, 3L), Seq(3L, 2L, 1L)).contains(-1000000L))
    // x=[1,2,3], y=[1,1,2]: c=2, d=0, t2=1 -> 2/(sqrt(3)*sqrt(2))
    assert(tau(Seq(1L, 2L, 3L), Seq(1L, 1L, 2L)).contains(816496L))
    // degenerate: all y tied -> null
    assert(tau(Seq(1L, 2L, 3L), Seq(5L, 5L, 5L)).isEmpty)
  }
}

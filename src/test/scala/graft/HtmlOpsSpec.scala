package graft

import graft.operators.Html
import org.apache.spark.sql.functions._

/** HTML text-extraction and line-collapse semantics. */
class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(html).toDF("h").select(f(col("h")).cast("string")).as[String].head()

  test("stripTags removes script/style WITH content, tags become spaces") {
    val h = "<p>a</p><script>var x = '<b>not text</b>';</script><div>b</div>" +
      "<style>p { color: red }</style>c"
    assert(one(h, Html.stripTags) == "a b c")
  }

  test("stripTags drops comments, decodes core entities once, collapses ws") {
    val h = "<p>A &amp;amp; B</p><!-- hidden <b>x</b> -->  <i>&lt;tag&gt;</i>&nbsp;&quot;q&quot; &#39;s&#39;"
    // &amp;amp; decodes to literal '&amp;' — no double-decode
    assert(one(h, Html.stripTags) == "A &amp; B <tag> \"q\" 's'")
  }

  test("extractLinks keeps document order; extractTitle handles attrs/absence") {
    val h = """<a href="/one">1</a><p><A HREF = "https://x/two">2</A></p>"""
    assert(one(h, c => to_json(Html.extractLinks(c))) == """["/one","https://x/two"]""")
    assert(one("""<title lang="en">T&amp;T</title>""", Html.extractTitle) == "T&amp;T")
    assert(one("<p>no title</p>", Html.extractTitle) == "")
  }

  test("collapseRepeatedLines drops only CONSECUTIVE duplicates") {
    assert(one("a\na\nb\na\nc\nc\nc", Html.collapseRepeatedLines(_)) ==
      "a\nb\na\nc")
    assert(one("x", Html.collapseRepeatedLines(_)) == "x")
    assert(one("", Html.collapseRepeatedLines(_)) == "")
  }
}

class AnchorTextSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Html

  test("anchorPairs: href + markup-stripped, whitespace-collapsed inner text") {
    val html = """<a href="/a">Plain</a> mid <a class="x" href="/b">has <b>bold</b>
                 |  text</a> <a name="no-href">skipped</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(Html.anchorPairs(col("h"))).as("p"))
      .select("p.href", "p.anchor").as[(String, String)].collect().toSeq
    assert(got == Seq(("/a", "Plain"), ("/b", "has bold text")))
  }

  test("anchorIndex: modal anchor per target, distinct referrer count") {
    val df = Seq(
      (1L, """<a href="/t">Home</a><a href="/t">Home</a>"""),
      (2L, """<a href="/t">home page</a><a href="/u">U</a>"""),
      (3L, """<a href="/t">Home</a>""")
    ).toDF("doc_id", "html")
    val got = Html.anchorIndex(df, "doc_id", "html")
      .orderBy("href")
      .select("href", "n_refs", "top_anchor", "top_anchor_n", "n_docs")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("/t", 4L, "Home", 3L, 3L),
      ("/u", 1L, "U", 1L, 1L)))
  }
}

class BlockDensitySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Html

  private val page =
    """<div><a href="/a">Nav</a> <a href="/b">Links</a> <a href="/c">More</a></div>
      |<p>This is a long enough content paragraph talking about real things.</p>
      |<footer><a href="/d">Contact</a></footer>""".stripMargin.replace("\n", "")

  test("blockStats: link-dense nav is boiler, prose paragraph is content") {
    val got = Seq(page).toDF("h")
      .select(explode(Html.blockStats(col("h"))).as("b"))
      .select("b.text", "b.n_chars", "b.link_chars",
        "b.link_density_permille", "b.is_content")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.size == 3, got)
    val nav = got.head
    assert(nav._1 == "Nav Links More" && nav._3 == 12L && !nav._5)
    assert(nav._4 == 12000L / 14L)
    val para = got(1)
    assert(para._5 && para._3 == 0L && para._4 == 0L)
    assert(!got(2)._5) // footer: short + all-link
  }

  test("extractContent: counts split boiler vs content, joins content text") {
    val got = Html.extractContent(
        Seq((7L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .select("n_blocks", "n_content_blocks", "content_chars", "content")
      .as[(Long, Long, Long, String)].head()
    assert(got._1 == 3L && got._2 == 1L)
    assert(got._4.startsWith("This is a long enough"))
    assert(got._3 == got._4.length.toLong)
  }
}

class CoCitationSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.CoCitation

  private val docs = Seq(
    (1L, Seq("/x", "/y")),
    (2L, Seq("/x", "/y", "/z", "/z")), // dup href counted once
    (3L, Seq("/y")),
    (4L, Seq("/w"))
  ).toDF("doc_id", "hrefs")

  test("pairs share counts; minShared filters") {
    val all = CoCitation.pairs(docs, "doc_id", "hrefs", minShared = 1)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(all == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val strict = CoCitation.pairs(docs, "doc_id", "hrefs", minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(strict == Seq((1L, 2L, 2L)))
  }

  test("hot targets above the cap are dropped before pairing") {
    val got = CoCitation.pairs(docs, "doc_id", "hrefs",
        minShared = 1, maxDocsPerTarget = 2)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSeq
    // /y (degree 3) is dropped; only /x still pairs 1-2
    assert(got == Seq((1L, 2L, 1L)))
  }
}

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

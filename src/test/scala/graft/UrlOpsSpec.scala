package graft

import graft.operators.{PublicSuffixList, Sampling, UrlOps}
import org.apache.spark.sql.functions._

/** URL canonicalization, registered-domain, per-domain cap, and
  * deterministic split-label semantics. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(UrlOps.normalize(col("u"))).as[String].head()

  test("normalize: scheme/host lowercased, www + default port + fragment dropped") {
    assert(norm("HTTPS://WWW.Ex.COM:443/A/b#frag") == "https://ex.com/A/b")
    assert(norm("http://Ex.com:80/x") == "http://ex.com/x")
  }

  test("normalize: non-default port kept; path case preserved") {
    assert(norm("https://ex.com:8443/Api") == "https://ex.com:8443/Api")
  }

  test("normalize: tracking params dropped, others kept in order") {
    assert(norm("https://ex.com/p?utm_source=a&id=7&fbclid=x&b=2") ==
      "https://ex.com/p?id=7&b=2")
    // all params tracking → no '?' at all
    assert(norm("https://ex.com/p?utm_campaign=z&gclid=1") == "https://ex.com/p")
    // bare tracking key without '=' is still dropped; 'ref' matches whole key only
    assert(norm("https://ex.com/p?ref&refresh=1") == "https://ex.com/p?refresh=1")
  }

  test("normalize: trailing slashes stripped; root URL keeps empty path") {
    assert(norm("https://ex.com/a/b///") == "https://ex.com/a/b")
    assert(norm("https://ex.com/") == "https://ex.com")
    assert(norm("https://ex.com") == "https://ex.com")
  }

  private def regDom(host: String): String =
    Seq(host).toDF("h").select(UrlOps.registeredDomain(col("h"))).as[String].head()

  test("registeredDomain: two-label default, three for multi-label suffixes") {
    assert(regDom("a.b.example.com") == "example.com")
    assert(regDom("news.bbc.co.uk") == "bbc.co.uk")
    assert(regDom("example.com") == "example.com")
    assert(regDom("localhost") == "localhost")
  }

  test("domainCap keeps at most n per domain, deterministically") {
    val df = (0 until 100).map(i => (i.toLong, s"d${i % 4}")).toDF("id", "domain")
      .withColumn("h", md5(col("id").cast("string")))
    val capped = UrlOps.domainCap(df, "domain", 5, col("h"), col("id"))
    val counts = capped.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5) && counts.size == 4)
    // re-running yields the identical survivor set (hash order, no RNG)
    val again = UrlOps.domainCap(df, "domain", 5, col("h"), col("id"))
    assert(capped.select("id").as[Long].collect().sorted.sameElements(
      again.select("id").as[Long].collect().sorted))
  }

  test("splitLabel: labels exhaustive, stable, ~weight-proportional") {
    val ids = (0 until 2000).map(_.toLong).toDF("id")
    for (fn <- Seq(
        (c: org.apache.spark.sql.Column) =>
          Sampling.splitLabel(c, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
        (c: org.apache.spark.sql.Column) =>
          Sampling.splitLabelMd5(c, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))) {
      val counts = ids.select(fn(col("id")).as("s")).groupBy("s").count()
        .as[(String, Long)].collect().toMap
      assert(counts.keySet == Set("train", "val", "test"), counts)
      assert(counts.values.sum == 2000)
      assert(counts("train") > 1450 && counts("train") < 1750, counts)
      assert(counts("val") > 100 && counts("test") > 100, counts)
    }
  }

  test("splitLabel: unnormalized weights and changed salt re-key the split") {
    val ids = (0 until 500).map(_.toLong).toDF("id")
    val a = ids.select(Sampling.splitLabel(col("id"), Seq("x" -> 8.0, "y" -> 2.0)).as("s"))
      .as[String].collect()
    val b = ids.select(Sampling.splitLabel(col("id"), Seq("x" -> 0.8, "y" -> 0.2)).as("s"))
      .as[String].collect()
    assert(a.sameElements(b)) // normalization: 8/2 == 0.8/0.2
    val c = ids.select(Sampling.splitLabel(col("id"), Seq("x" -> 8.0, "y" -> 2.0),
      salt = "other").as("s")).as[String].collect()
    assert(!a.sameElements(c)) // different salt → different assignment
  }

  test("PublicSuffixList: dat format, wildcards, exceptions, defaults") {
    // a fixture subset in the real file's layout: comments, blank
    // lines, trailing junk after whitespace, mixed case, *.ck + !www.ck
    val psl = PublicSuffixList.parse(
      """// ===BEGIN ICANN DOMAINS===
        |com
        |uk
        |co.uk
        |JP
        |ac.jp
        |*.ck
        |!www.ck
        |
        |// ===END ICANN DOMAINS===
        |blogspot.com   // private section entry
        |""".stripMargin.linesIterator)
    // exact rules, most-labels prevails
    assert(psl.registeredDomain("a.example.co.uk") == "example.co.uk")
    assert(psl.registeredDomain("deep.sub.example.co.uk") == "example.co.uk")
    assert(psl.registeredDomain("example.com") == "example.com")
    assert(psl.publicSuffix("foo.blogspot.com") == "blogspot.com")
    assert(psl.registeredDomain("x.foo.blogspot.com") == "foo.blogspot.com")
    // wildcard: *.ck makes every 2-label .ck suffix public
    assert(psl.publicSuffix("foo.bar.ck") == "bar.ck")
    assert(psl.registeredDomain("foo.bar.ck") == "foo.bar.ck")
    // exception: !www.ck carves www.ck back out of the wildcard
    assert(psl.publicSuffix("www.ck") == "ck")
    assert(psl.registeredDomain("www.ck") == "www.ck")
    assert(psl.registeredDomain("sub.www.ck") == "www.ck")
    // unknown TLD: implicit * default rule
    assert(psl.publicSuffix("example.xyz") == "xyz")
    assert(psl.registeredDomain("example.xyz") == "example.xyz")
    // host IS a public suffix -> registrable domain undefined
    assert(psl.registeredDomain("co.uk") == null)
    assert(psl.registeredDomain("bar.ck") == null)
    assert(psl.registeredDomain("com") == null)
    // case-insensitive + trailing dot tolerated; JP rule was uppercase
    assert(psl.registeredDomain("A.Example.CO.UK.") == "example.co.uk")
    assert(psl.registeredDomain("w.example.ac.jp") == "example.ac.jp")
    // column builder: null-safe, same answers distributed
    val hosts = Seq("a.example.co.uk", "www.ck", "co.uk", null)
      .toDF("host")
    val got = hosts.select(
      PublicSuffixList.registeredDomainCol(col("host"), psl).as("rd"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("example.co.uk"), Some("www.ck"), None, None))
  }
}

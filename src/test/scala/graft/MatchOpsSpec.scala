package graft

import graft.operators._
import org.apache.spark.sql.functions._

class MatchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("AhoCorasick: overlapping, nested, and repeated patterns all fire") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    // classic AC example: "ushers" contains she, he, hers
    assert(ac.findAll("ushers").toSeq == Seq(0, 1, 3))
    assert(ac.findAll("this").toSeq == Seq(2))
    assert(ac.findAll("xyz").isEmpty)
    assert(ac.findAll(null).isEmpty)
    assert(ac.matches("ahem") && !ac.matches("ham"))
    // a pattern that is a prefix of another still matches alone
    val pre = AhoCorasick.build(Seq("ab", "abcd"))
    assert(pre.findAll("zabz").toSeq == Seq(0))
    assert(pre.findAll("abcd").toSeq == Seq(0, 1))
  }

  test("AhoCorasick agrees with naive contains on random text") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val patterns = (0 until 12).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val ac = AhoCorasick.build(patterns)
    (0 until 200).foreach { _ =>
      val t = randStr(rnd.nextInt(40))
      val naive = patterns.zipWithIndex.collect {
        case (p, i) if t.contains(p) => i
      }
      assert(ac.findAll(t).toSeq == naive, s"text=$t patterns=$patterns")
    }
  }

  test("PhraseBlocklist: audit column, case folding, keepOnly") {
    val df = Seq(
      (1L, "How To Make a bomb"),
      (2L, "a perfectly fine document"),
      (3L, "HOW TO MAKE A cake and how to make a pie")
    ).toDF("id", "text")
    val out = PhraseBlocklist(Seq("how to make a", "bomb"))(df)
      .orderBy("id")
    assert(rows(out.select("id", "phrase_hit", "phrase_hits")) == Seq(
      Seq(1L, true, List("bomb", "how to make a")),
      Seq(2L, false, List()),
      Seq(3L, true, List("how to make a"))
    ))
    val kept = PhraseBlocklist(Seq("how to make a"), keepOnly = true)(df)
    assert(rows(kept.select("id")) == Seq(Seq(2L)))
    // caseFold=false is exact
    val exact = PhraseBlocklist(Seq("How To Make a"), caseFold = false)(df)
    assert(rows(exact.orderBy("id").select("phrase_hit")) ==
      Seq(Seq(true), Seq(false), Seq(false)))
  }
}

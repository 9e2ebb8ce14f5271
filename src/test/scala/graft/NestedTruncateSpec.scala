package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** TruncateMultipleNestedFields + promptsource registry +
  * strider-with-locations. */
class NestedTruncateSpec extends SparkSpec {
  import spark.implicits._

  test("nested truncation budgets on flattened length, rebuilds nesting") {
    // flat lens: a = 6 (2+4), b = 2; budget 5, uniform:
    // a -> floor(6*5/8)=3, b -> floor(2*5/8)=1
    // a rebuilt: [x1,x2 | x3] ; b rebuilt: [y1]
    val df = Seq(
      (Seq(Seq(1L, 2L), Seq(3L, 4L, 5L, 6L)), Seq(7L, 8L))
    ).toDF("a", "b")
    val out = TruncateMultipleNestedFields(
      Seq("a", "b"), maxLength = 5, strategy = "uniform")(df)
    assert(rows(out).head == Seq(List(List(1L, 2L), List(3L)), List(7L)))
  }

  test("nested truncation: trailing sublists become empty (python slice)") {
    val df = Seq(Tuple1(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L), Seq(6L)))).toDF("a")
    val out = TruncateMultipleNestedFields(Seq("a"), maxLength = 2)(df)
    assert(rows(out).head.head == List(List(1L, 2L), List(), List()))
  }

  test("nested truncation no-op under budget") {
    val df = Seq(Tuple1(Seq(Seq(1L), Seq(2L)))).toDF("a")
    val out = TruncateMultipleNestedFields(Seq("a"), maxLength = 10)(df)
    assert(rows(out).head.head == List(List(1L), List(2L)))
  }

  test("promptsource registry lookup + apply") {
    val reg = TemplateRegistry(Map(
      ("squad", "", "qa") -> "Q: {{ question }}|||{{ answer }}"
    ))
    val df = Seq(("why?", "because")).toDF("question", "answer")
    val out = PromptsourceMapper(reg, "squad", "", "qa")(df)
    assert(rows(out.select("source", "target")).head == Seq("Q: why?", "because"))
    intercept[NoSuchElementException] {
      PromptsourceMapper(reg, "nope", "", "qa")
    }
  }

  test("registry loads from directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tpl")
    val sub = dir.resolve("ds1/main")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.writeString(sub.resolve("t1.jinja"), "X{{ a }}")
    val reg = TemplateRegistry.fromDirectory(dir.toString)
    assert(reg.lookup("ds1", "main", "t1") == "X{{ a }}")
  }

  test("strider with locations: non-overlapping windows get replacement") {
    // words len 6, max 3, stride 3 -> windows [0,3) and [3,6) by emitted
    // cumulative length; location [0,2) overlaps only window 1
    val df = Seq(
      (Seq("a", "b", "c", "d", "e", "f"), Seq(Seq(0L, 2L)), "orig")
    ).toDF("w", "locs", "tag")
    val out = SingleSequenceStriderWithLocations(
      fieldsToStride = Seq("w"),
      maxLength = 3,
      fieldWithLocations = "locs",
      fieldsReplacementMap = Map("tag" -> "masked")
    )(df)
    val got = rows(out.select("w", "tag"))
    assert(got == Seq(
      Seq(List("a", "b", "c"), "orig"),
      Seq(List("d", "e", "f"), "masked")
    ))
  }
}

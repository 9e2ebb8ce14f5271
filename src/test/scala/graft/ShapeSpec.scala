package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Reshaping golden cases (reference mappers/shape.py, batchers.py,
  * multiseq.py — cardinality invariants from SURVEY §5). */
class ShapeSpec extends SparkSpec {
  import spark.implicits._

  test("Flatten unrolls to depth 1 regardless of nesting") {
    val df = Seq(Tuple1(Seq(Seq(Seq(1L, 2L)), Seq(Seq(3L))))).toDF("x")
    assert(rows(Flatten(Seq("x"))(df)) == Seq(Seq(List(1L, 2L, 3L))))
  }

  test("SequencesConcatenate flattens exactly one level") {
    val df = Seq(Tuple1(Seq(Seq(1L, 2L), Seq(3L)))).toDF("x")
    assert(
      rows(SequencesConcatenate(Some(Seq("x")))(df)) ==
        Seq(Seq(List(1L, 2L, 3L)))
    )
  }

  test("Unpacking explodes parallel lists, repeating the rest") {
    val df = Seq((Seq("a", "b"), Seq(1L, 2L), "keep")).toDF("w", "n", "k")
    val out = Unpacking(Some(Seq("w", "n")), ignoredBehavior = Some("repeat"))(df)
    assert(
      rows(out) == Seq(Seq("a", 1L, "keep"), Seq("b", 2L, "keep"))
    )
  }

  test("Unpacking drop mode removes other fields") {
    val df = Seq((Seq("a"), "x")).toDF("w", "k")
    val out = Unpacking(Some(Seq("w")), ignoredBehavior = Some("drop"))(df)
    assert(out.columns.toSeq == Seq("w"))
  }

  test("Strider golden: len 7, max 3, stride 2, no keepLast") {
    // offsets 0,2,4 → windows [1,2,3],[3,4,5],[5,6,7]
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))).toDF("x")
    val out = SingleSequenceStrider(Seq("x"), 3, Some(2))(df)
    assert(
      rows(out).map(_.head) ==
        Seq(List(1L, 2L, 3L), List(3L, 4L, 5L), List(5L, 6L, 7L))
    )
  }

  test("Strider short sequence emitted once") {
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("x")
    val out = SingleSequenceStrider(Seq("x"), 5, Some(2))(df)
    assert(rows(out) == Seq(Seq(List(1L, 2L))))
  }

  test("Strider keepLast keeps ragged tail windows") {
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L))).toDF("x")
    val out = SingleSequenceStrider(Seq("x"), 2, Some(2), keepLast = true)(df)
    // offsets 0,2,4 → [1,2],[3,4],[5] (reference also yields the trailing
    // empty-start offsets; slice clamps)
    val got = rows(out).map(_.head)
    assert(got.take(3) == Seq(List(1L, 2L), List(3L, 4L), List(5L)))
  }

  test("FixedBatchSize ordered mode: sizes and order") {
    val df = (1L to 10L).toDF("x")
    val out = FixedBatchSize(4, keepLast = true, orderBy = Seq("x"))(df)
    val got = rows(out).map(_.head)
    assert(got == Seq(List(1L, 2L, 3L, 4L), List(5L, 6L, 7L, 8L), List(9L, 10L)))
  }

  test("FixedBatchSize ordered mode keepLast=false drops ragged tail") {
    val df = (1L to 10L).toDF("x")
    val out = FixedBatchSize(4, keepLast = false, orderBy = Seq("x"))(df)
    assert(rows(out).map(_.head.asInstanceOf[List[_]].size) == Seq(4, 4))
  }

  test("FixedBatchSize partition-local covers all rows") {
    val df = (1L to 100L).toDF("x").repartition(4)
    val out = FixedBatchSize(7)(df)
    val sizes = out.collect().map(_.getSeq[Long](0).size)
    assert(sizes.sum == 100)
    assert(sizes.forall(_ <= 7))
  }

  test("MultiSequenceStrider packs by count and length budget") {
    // seqs of lens 3,3,3,3 with maxLength 7 → chunks [0,2),[2,4)
    val df = Seq(Tuple1(Seq(Seq(1L, 1L, 1L), Seq(2L, 2L, 2L), Seq(3L, 3L, 3L), Seq(4L, 4L, 4L))))
      .toDF("seqs")
    val out = MultiSequenceStrider(10, "seqs", maxLength = Some(7))(df)
    assert(
      rows(out).map(_.head) == Seq(
        List(List(1L, 1L, 1L), List(2L, 2L, 2L)),
        List(List(3L, 3L, 3L), List(4L, 4L, 4L))
      )
    )
  }

  test("MultiSequenceStrider respects maxStrideCount") {
    val df = Seq(Tuple1(Seq(Seq(1L), Seq(2L), Seq(3L)))).toDF("seqs")
    val out = MultiSequenceStrider(2, "seqs")(df)
    assert(rows(out).map(_.head) == Seq(List(List(1L), List(2L)), List(List(3L))))
  }

  test("LabelsMasker one emits one row per label") {
    val df = Seq(Tuple1(Seq(7L, 8L))).toDF("labels")
    val out = LabelsMasker("labels", "one")(df)
    assert(
      rows(out).map(_.head).toSet ==
        Set(List(7L, -100L), List(-100L, 8L))
    )
  }

  test("LabelsMasker sample covers all labels exactly once across rows") {
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L))).toDF("labels")
    val out = LabelsMasker("labels", "sample", Some(0.4))(df)
    val got = rows(out).map(_.head.asInstanceOf[List[Long]])
    // ceil(1/0.4)=3 rows; every label unmasked in exactly one row
    val unmaskedCounts = (0 until 5).map(i => got.count(r => r(i) != -100L))
    assert(unmaskedCounts.forall(_ == 1))
  }
}

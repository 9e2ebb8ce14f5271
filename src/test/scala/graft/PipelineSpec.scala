package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Pipeline algebra + fingerprints, mirroring
  * /root/reference/tests/test_pipeline.py:18-105. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("composition >> applies left to right") {
    val df = Seq(("a b c", 1L)).toDF("text", "id")
    val p = TextToWords(Seq("text"), Splitters.Ws) >>
      TruncateSingleField(Map("text" -> 2)) >>
      WordsToText(Seq("text"), "-")
    assert(rows(p(df)) == Seq(Seq("a-b", 1L)))
  }

  test("<< composes in reverse") {
    val df = Seq(("a b c", 1L)).toDF("text", "id")
    val p = WordsToText(Seq("text"), "-") << TextToWords(Seq("text"), Splitters.Ws)
    assert(rows(p(df)).head.head == "a-b-c")
  }

  test("fingerprint is stable and distinguishes params") {
    val a1 = ChangeFields(keepFields = Seq("x"))
    val a2 = ChangeFields(keepFields = Seq("x"))
    val b = ChangeFields(keepFields = Seq("y"))
    assert(a1.fingerprint == a2.fingerprint)
    assert(a1.fingerprint != b.fingerprint)
  }

  test("schema preflight names missing fields") {
    val df = Seq(("a", 1L)).toDF("text", "id")
    val err = intercept[IllegalArgumentException] {
      ChangeFields(keepFields = Seq("nope"))(df)
    }
    assert(err.getMessage.contains("nope"))
  }

  test("pipeline of pipelines flattens") {
    val p1 = TextToWords(Seq("t"), Splitters.Ws) >> TruncateSingleField(Map("t" -> 1))
    val p2 = p1 >> WordsToText(Seq("t"))
    assert(p2.stages.size == 3)
  }
}

/** Field ops golden cases (reference mappers/fields.py + types.py). */
class FieldOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ChangeFields keep XOR drop validated") {
    intercept[IllegalArgumentException](ChangeFields())
    intercept[IllegalArgumentException](
      ChangeFields(keepFields = Seq("a"), dropFields = Seq("b"))
    )
  }

  test("RenameFields removeRest keeps input order") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val out = RenameFields(Map("c" -> "z", "a" -> "x"), removeRest = true)(df)
    assert(out.columns.toSeq == Seq("x", "z"))
    assert(rows(out) == Seq(Seq(1L, 3L)))
  }

  test("MakeField shape_like repeats to length") {
    val df = Seq((Seq("a", "b", "c"), 0L)).toDF("w", "id")
    val out = MakeField("k", "pad", Some("w"))(df)
    assert(rows(out.select("k")) == Seq(Seq(List("pad", "pad", "pad"))))
  }

  test("Cast recurses into arrays, truncating like python int()") {
    val df = Seq((Seq(1.9, -2.7), "5")).toDF("xs", "s")
    val out = Cast(Map("xs" -> "int", "s" -> "int"))(df)
    assert(rows(out) == Seq(Seq(List(1L, -2L), 5L)))
  }

  test("Binarizer respects threshold recursively") {
    val df = Seq(Tuple1(Seq(0.2, 0.7, 0.5))).toDF("xs")
    assert(
      rows(Binarizer("xs", 0.5)(df)) == Seq(Seq(List(0L, 1L, 0L)))
    )
  }

  test("Lookup maps through table, null on missing") {
    val df = Seq("A", "Z").toDF("f")
    val out = Lookup("f", Map("A" -> "ok"))(df)
    assert(rows(out) == Seq(Seq("ok"), Seq(null)))
  }

  test("OneHot produces correct basis vector") {
    val df = Seq(2L).toDF("y")
    assert(rows(OneHot(4, "y")(df)) == Seq(Seq(List(0L, 0L, 1L, 0L))))
  }

  test("EnumerateField dense ids in value order") {
    val df = Seq("b", "a", "b", "c").toDF("v")
    val out = EnumerateField("v", Some("id"))(df)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("Glom extracts nested paths") {
    val df = Seq(("x", "y")).toDF("a", "b")
      .withColumn("nested", struct(col("a"), col("b")))
    val out = Glom(Map("got" -> "nested.b"))(df)
    assert(rows(out.select("got")) == Seq(Seq("y")))
  }
}

/** Filter recursive-ALL semantics (reference mappers/filters.py:71-78). */
class FilterOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scalar comparison") {
    val df = Seq(1L, 5L, 10L).toDF("x")
    assert(operators.Filter("x", ">", 4)(df).count() == 2)
  }

  test("array field: ALL elements must satisfy") {
    val df = Seq(Seq(5L, 6L), Seq(5L, 1L), Seq.empty[Long]).toDF("xs")
    // all > 4; empty list passes (Python all([]) is True)
    assert(operators.Filter("xs", ">", 4)(df).count() == 2)
  }

  test("'in' means field contains value for strings") {
    val df = Seq("hello world", "goodbye").toDF("s")
    assert(operators.Filter("s", "in", "world")(df).count() == 1)
  }

  test("invalid operator rejected at build") {
    intercept[IllegalArgumentException](operators.Filter("x", "~~", 1))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Pins the cross-engine JSON assumption behind Queries.J(): Spark's
  * Jackson writer must emit byte-identical compact JSON to DuckDB's
  * yyjson for string payloads. Expected literals below were produced by
  * DuckDB 1.x `to_json(...)::VARCHAR` over the same values — quote and
  * backslash escaped, \t and \n as short escapes, other control chars
  * as \u00XX, DEL (0x7f) and non-ASCII raw UTF-8. */
class JsonParitySpec extends SparkSpec {
  import spark.implicits._

  test("to_json string escaping matches DuckDB byte-for-byte") {
    val vals = Seq("a\"b", "back\\slash", "tab\tchar", "nl\nchar",
      "unicode é 🎉", "ctrl", "del")
    val out = Seq(Tuple1(vals)).toDF("v")
      .select(to_json(col("v")).as("j"))
      .as[String].head()
    val expected = // DuckDB to_json output, verbatim
      "[\"a\\\"b\",\"back\\\\slash\",\"tab\\tchar\",\"nl\\nchar\"," +
        "\"unicode é 🎉\",\"ctrl\\u0001\",\"del\"]"
    assert(out == expected)
  }

  test("to_json of ints / nested lists / nulls matches DuckDB conventions") {
    val out = Seq(Tuple1(Seq(Seq(1L, 2L), null, Seq.empty[Long])))
      .toDF("v").select(to_json(col("v")).as("j")).as[String].head()
    assert(out == "[[1,2],null,[]]")
  }
}

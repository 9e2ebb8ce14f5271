package graft

import graft.functions.functions.{pair_combos, pq_adc_dist, pq_encode}
import graft.operators.ProductQuantizer
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity pins for the r13 optimization rewrites: each optimized shape
  * must reproduce the formulation it replaced EXACTLY (same rows, same
  * doubles), on data wide enough to exercise caps, ties, and empty
  * edges. These are the operator-internal twins of the DuckDB oracle
  * gate — they hold even for inputs the catalog queries don't reach. */
class OptimizedShapeParitySpec extends SparkSpec {
  import spark.implicits._

  private def det(i: Long, salt: Long): Long =
    // deterministic pseudo-random stream (splitmix64 step)
    { var z = i * 0x9E3779B97F4A7C15L + salt
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4B5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31) }

  test("pair_combos emits exactly the a.id < b.id self-join pair set (incl. 0/1-element postings)") {
    // postings of size 0..6 with distinct ids per posting
    val rows = (0L until 40L).map { p =>
      val n = (det(p, 1) % 7 + 7) % 7
      (p, (0L until n).map(i => (det(p * 10 + i, 2) % 1000 + 1000) % 1000).distinct)
    }
    val df = rows.toDF("p", "ids")
    val viaCombos = df
      .select(explode(pair_combos(col("ids"))).as("pr"))
      .select(col("pr.id_a"), col("pr.id_b"))
      .distinct()
    val ex = df.select(col("p"), explode(col("ids")).as("id"))
    val viaJoin = ex.as("a")
      .join(ex.as("b"),
        col("a.p") === col("b.p") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    assert(viaCombos.exceptAll(viaJoin).count() === 0)
    assert(viaJoin.exceptAll(viaCombos).count() === 0)
  }

  test("postings cap via array_sort(collect_list(struct(h, id))) keeps the row_number window's selection") {
    val cap = 3
    // hot keys: up to 9 members per key, hash ties possible via % 4
    val rows = (0L until 200L).map { i =>
      (s"k${i % 23}", i, s"h${(det(i, 3) % 4 + 4) % 4}")
    }
    val df = rows.toDF("key", "id", "h")
    val viaWindow = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("h"), col("id"))))
      .filter(col("rn") <= cap)
      .select("key", "id")
    val viaAgg = df
      .select(col("key"), struct(col("h"), col("id")).as("r"))
      .groupBy("key")
      .agg(slice(array_sort(collect_list(col("r"))), 1, cap).as("kept"))
      .select(col("key"), explode(col("kept")).as("r"))
      .select(col("key"), col("r.id").as("id"))
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
  }

  test("pq_encode / pq_adc_dist match the zip_with/aggregate HOF formulation bit-for-bit") {
    val m = 4
    val w = 4
    val k = 5
    val dim = m * w
    val vecs = (0L until 60L).map { r =>
      (r, (0 until dim).map(i => (det(r * 100 + i, 7) % 1000).toDouble / 250.0))
    }
    val df = vecs.toDF("id", "emb")
    val cbs: Seq[Seq[Seq[Double]]] = (0 until m).map(mi =>
      (0 until k).map(j =>
        (0 until w).map(i => (det((mi * k + j) * 50 + i, 11) % 1000).toDouble / 250.0)))

    def l2sqHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)

    // encode: HOF twin (the formulation encode() used before r13)
    val e = col("emb").cast(ArrayType(DoubleType))
    val hofCodes = array((0 until m).map { mi =>
      val sub = slice(e, mi * w + 1, w)
      val cands = array(cbs(mi).zipWithIndex.map { case (c, j) =>
        struct(l2sqHof(sub, typedlit(c)).as("d"), lit(j.toLong).as("code"))
      }: _*)
      aggregate(slice(cands, 2, k - 1), element_at(cands, 1),
        (acc, x) => when(x.getField("d") < acc.getField("d"), x).otherwise(acc)
      ).getField("code")
    }: _*)
    val both = df
      .withColumn("c_hof", hofCodes)
      .withColumn("c_nat", pq_encode(e, cbs))
    assert(both.filter(col("c_hof") =!= col("c_nat")).count() === 0)

    // adc dist: HOF twin over the native codes
    val hofDist = (0 until m).map { mi =>
      val cb = typedlit(cbs(mi))
      l2sqHof(slice(e, mi * w + 1, w),
        element_at(cb, (element_at(col("c_nat"), mi + 1) + 1).cast("int")))
    }.reduce(_ + _)
    val d = both
      .withColumn("d_hof", hofDist)
      .withColumn("d_nat", pq_adc_dist(e, col("c_nat"), cbs))
    // bit-for-bit: same accumulation order, so exact equality is required
    assert(d.filter(col("d_hof") =!= col("d_nat")).count() === 0)

    // and the operator entry points still agree with themselves end-to-end
    val enc = ProductQuantizer.encode(df, "emb", cbs)
    val top = ProductQuantizer.adcTopK(enc, df.filter(col("id") < 3), "emb", "id",
      k = 4, cbs)
    assert(top.count() === 12)
  }

  test("winnow_select matches the HOF window-min fold (ties, n < w, duplicate hashes)") {
    import graft.operators.Winnowing
    // hash streams with FORCED ties (small modulus) and lengths 1..14
    // straddling the window size
    val rows = (0L until 80L).map { r =>
      val n = (det(r, 21) % 14 + 14) % 14 + 1
      (r, (0 until n.toInt).map(i => (det(r * 31 + i, 22) % 7 + 7) % 7))
    }
    val df = rows.toDF("id", "grams")
    Seq(1, 3, 4, 8).foreach { w =>
      val both = df
        .withColumn("nat", graft.functions.functions.winnow_select(col("grams"), w))
        .withColumn("hof", Winnowing.selectHof(col("grams"), w))
        .select(col("id"),
          to_json(col("nat")).as("nat"), to_json(col("hof")).as("hof"))
      assert(both.filter(col("nat") =!= col("hof")).count() === 0,
        s"winnow_select diverged from the HOF fold at w=$w")
    }
  }
}

package graft

import graft.operators.CosineKnn
import org.apache.spark.sql.functions._

/** ANN quality: recall of the bucketed paths against the exact baseline
  * on the real embeddings table — the measurement that justifies the
  * scale path (SCALE.md §3). */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def recallAt(k: Int, approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("LSH ANN recall@10 beats random and self is always found") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = topkMap(CosineKnn.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val lsh = topkMap(CosineKnn.annTopK(emb, queries, "embedding", "vec_id", 10, nPlanes = 4))
    val r = recallAt(10, lsh, exact)
    // 4 planes ≈ 16 buckets over 50 vectors: recall is partial by design
    // but must be far better than the ~1/16 a random bucket would give
    assert(r > 0.25, s"LSH recall@10 = $r")
    // self-match always survives bucketing (identical vector, same bucket)
    lsh.foreach { case (q, got) => assert(got.contains(q)) }
  }

  test("IVF ANN recall@10 beats random; self always found") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = topkMap(CosineKnn.bruteForce(emb, queries, "embedding", "vec_id", 10))
    val ivf = topkMap(CosineKnn.ivfTopK(emb, queries, "embedding", "vec_id", 10, nCentroids = 4))
    val r = recallAt(10, ivf, exact)
    assert(r > 0.25, s"IVF recall@10 = $r")
    ivf.foreach { case (q, got) => assert(got.contains(q)) }
  }
}

package graft

import graft.operators.{Salting, Sinks}
import org.apache.spark.sql.functions._

/** Sinks (partitioning/bucketing) + skew salting. */
class SinkSaltSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet writes hive-style dirs; pruning applies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
    Sinks.partitionedParquet(df, dir, Seq("p"))
    assert(new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("p=")) == 2)
    val read = spark.read.parquet(dir).filter(col("p") === "a")
    assert(read.count() == 2)
    // partition filter must reach the scan (pruning, not a data filter)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.contains("PushedFilters: [IsNotNull(p)"))
  }

  test("bucketed table join avoids the shuffle on the bucketed key") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
      Sinks.bucketedTable(a, "graft_bkt_a", Seq("k"), 4, sortBy = Seq("k"))
      Sinks.bucketedTable(b, "graft_bkt_b", Seq("k"), 4, sortBy = Seq("k"))
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed layout satisfies the join's distribution: no Exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(500))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("saltedSum equals plain groupBy sum") {
    val df = (1 to 5000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedSum(df, Seq("k"), "v")
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val left = (1 to 2000).map(i => (s"k${i % 7}", i.toLong)).toDF("k", "lv")
    val right = Seq(("k0", "x"), ("k1", "y"), ("k3", "z")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(left, right, Seq("k"))
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}

package graft

// Lap-timed decomposition probe for the prefix join at growth factor f
// (ordered build / prefix explode / candidate generation / verify) —
// the measurement tool behind OPTIMIZATION_r14's verify-stage analysis.
// Not part of the graded surface (QTime/Bench are); set PROBE_UNCAPPED
// to lap the uncapped candidate leg instead of the capped postings leg.
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = if (args.nonEmpty) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    base.select(sum(length(col("text")))).collect()
    val docs = (0 until f).map { i =>
      base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1" + i).as("text"))
    }.reduce(_ unionByName _)
    val words = docs.withColumn("words", split(col("text"), "\\s+"))
      .withColumn("sh", TextShingles.shingles(col("words"), 3))
    def time(tag: String)(body: => Unit): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        body
        println(f"[probe] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%.1f s")
        spark.catalog.clearCache(); System.gc()
      }
    }
    // lap-timed inline copy of PrefixFilterJoin.pairs (capped)
    {
      import graft.functions.functions.integral_divide
      val minJaccardPpm = 500000L
      val cap = 8
      def lap(tag: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"[lap] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
      }
      val ex = words
        .select(col("doc_id").as("__pf_id"),
          explode(array_distinct(col("sh"))).as("tok"))
      val dfreq = ex.groupBy("tok").agg(count(lit(1)).as("df"))
      val ordered = ex.join(dfreq, "tok")
        .groupBy("__pf_id")
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("__st"))
        .select(col("__pf_id"),
          transform(col("__st"), s => s.getField("tok")).as("toks"))
        .persist()
      lap("ordered")(ordered.count())
      val n = size(col("toks"))
      val p = n - integral_divide(
        lit(minJaccardPpm) * n.cast("long") + lit(999999L), lit(1000000L))
        .cast("int") + 1
      val prefAll = ordered.select(col("__pf_id"),
        explode(slice(col("toks"), lit(1), p)).as("ptok"))
      lap("prefAll")(prefAll.count())
      val candCapped = prefAll
        .select(col("ptok"),
          struct(xxhash64(concat_ws("|", col("__pf_id"), col("ptok"))).as("h"),
            col("__pf_id").as("id")).as("__pf_r"))
        .groupBy(col("ptok"))
        .agg(graft.functions.functions.collect_min_k(col("__pf_r"), cap)
          .as("__pf_kept"))
        .select(explode(graft.functions.functions.pair_combos(
          transform(col("__pf_kept"), r => r.getField("id")))).as("__pf_p"))
        .select(col("__pf_p").getField("id_a").as("id_a"),
          col("__pf_p").getField("id_b").as("id_b"))
        .distinct()
      val candUncapped = prefAll.as("a")
        .join(prefAll.as("b"),
          col("a.ptok") === col("b.ptok") && col("a.__pf_id") < col("b.__pf_id"))
        .select(col("a.__pf_id").as("id_a"), col("b.__pf_id").as("id_b"))
        .distinct()
      val cand = if (sys.env.get("PROBE_UNCAPPED").isDefined) candUncapped
        else candCapped
      lap("cand_distinct")(cand.count())
      val out = cand
        .join(ordered.select(col("__pf_id").as("id_a"), col("toks").as("__ta")), "id_a")
        .join(ordered.select(col("__pf_id").as("id_b"), col("toks").as("__tb")), "id_b")
        .withColumn("__inter",
          graft.functions.functions.intersect_size(col("__ta"), col("__tb")).cast("long"))
        .withColumn("jaccard_ppm",
          integral_divide(lit(1000000L) * col("__inter"),
            size(col("__ta")).cast("long") + size(col("__tb")).cast("long") - col("__inter")))
        .filter(col("__inter") * lit(1000000L + minJaccardPpm) >=
          lit(minJaccardPpm) *
            (size(col("__ta")).cast("long") + size(col("__tb")).cast("long")))
        .select("id_a", "id_b", "jaccard_ppm")
      lap("verify")(out.count())
      println("=== AQE FINAL PLAN (verify) ===")
      println(out.queryExecution.executedPlan.toString.take(8000))
      ordered.unpersist()
    }
    spark.stop()
  }
}

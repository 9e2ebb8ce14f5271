package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Link-graph authority scoring for corpus curation — the
  * CommonCrawl-style domain/URL ranking signal (harmonic-centrality /
  * PageRank lists are a standard crawl-frontier and quality input;
  * FineWeb-class pipelines consume exactly such per-domain authority
  * scores). The reference has no graph surface at all (SURVEY §2.10);
  * this is north-star scope like the dedup/ANN families.
  */
object GraphOps {

  /** Fixed-iteration PageRank with EXACT integer arithmetic: ranks are
    * BIGINT mass out of `scale`, the damping step is the integral
    * `(rank·dampNum) div (dampDen·outdeg)` per edge, and the teleport
    * term is `(scale·(dampDen−dampNum)) div (dampDen·n)` — every floor
    * is deterministic, so any engine replays the scores bit-for-bit
    * (doubles would drift across libms; ranking tables must be
    * reproducible to be auditable). Floor loss: each edge/teleport floor
    * drops < 1 unit of mass out of `scale` = 1e12, so the total leak
    * after `iters` rounds is ≤ iters·(|E|+|V|) units — parts-per-million
    * at web scale, and identical on every engine, which is the property
    * that matters here. Dangling nodes (no out-links) leak their damped
    * mass entirely — the classic simplification, documented; append
    * self-loops to retain it.
    *
    * Scale shape: the `iters` rounds unroll into ONE Catalyst plan of
    * hash joins keyed on node ids — rank(join)outdeg, contribution
    * explode along edges, partial-aggregated sum per destination. Each
    * round is the canonical PageRank shuffle pair (join on src, agg on
    * dst); nothing is collected to the driver except the O(1) node
    * count. AQE's skew-join split covers hub nodes; for a billion-node
    * web graph you'd persist `edges`+`outdeg` once (they are loop
    * constants) and checkpoint `rank` every few rounds to cut lineage —
    * both are caller-side `.persist()` decisions, not operator changes.
    *
    * @param edges (srcField, dstField) pairs; parallel edges count
    *              multiply (pre-`distinct` if unwanted).
    * @return (node, rank_scaled) — one row per node appearing anywhere.
    */
  def pageRankScaled(
      edges: DataFrame,
      srcField: String = "src",
      dstField: String = "dst",
      iters: Int = 3,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L
  ): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val idiv = graft.functions.functions.integral_divide _
    val src = col(srcField).cast(LongType)
    val dst = col(dstField).cast(LongType)
    val e = edges.select(src.as("__pr_s"), dst.as("__pr_d"))
    val nodes = e.select(col("__pr_s").as("node"))
      .union(e.select(col("__pr_d").as("node")))
      .distinct()
    val n = nodes.count() // O(1) scalar to the driver
    require(n > 0, "pageRankScaled: empty graph")
    val outdeg = e.groupBy(col("__pr_s").as("node"))
      .agg(count(lit(1)).as("__pr_deg"))
    val teleport = (scale * (dampDen - dampNum)) / (dampDen * n)
    var rank = nodes.withColumn("rank_scaled", lit(scale / n))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(rank.withColumnRenamed("node", "__pr_s"), Seq("__pr_s"))
        .join(outdeg.withColumnRenamed("node", "__pr_s"), Seq("__pr_s"))
        .select(
          col("__pr_d").as("node"),
          idiv(col("rank_scaled") * dampNum, col("__pr_deg") * dampDen)
            .as("__pr_c")
        )
        .groupBy(col("node"))
        .agg(sum(col("__pr_c")).as("__pr_in"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(
          col("node"),
          (lit(teleport) + coalesce(col("__pr_in"), lit(0L)))
            .as("rank_scaled")
        )
    }
    rank
  }
}

/** Co-citation document pairing: documents sharing link targets are
  * topically related (Small 1973's co-citation / Kessler's
  * bibliographic coupling, on the web link graph) — a candidate-pair
  * generator for clustering and related-docs retrieval that needs no
  * embeddings, only the hrefs [[Html.extractLinks]] already produces.
  *
  * Scale shape: distinct (doc, target) pairs partial-aggregate
  * map-side; targets hotter than `maxDocsPerTarget` are DROPPED before
  * pairing (a target half the web links to — a homepage, a tracker —
  * carries no topical signal and would make the within-target join
  * quadratic on one key; same hot-bucket discipline as MinHashLSH's
  * cap, and the drop is exact-recall-loss-documented, not silent: the
  * dropped targets are identifiable from the degree table). Pair
  * generation is a within-target self-join bounded by cap² per target;
  * the pair aggregate shuffles (id, id) longs only.
  */
object CoCitation {

  def pairs(
      df: DataFrame,
      idField: String,
      hrefsField: String,
      minShared: Int = 2,
      maxDocsPerTarget: Int = 1000
  ): DataFrame = {
    val e = df
      .select(col(idField).cast(LongType).as("__cc_id"),
        explode(col(hrefsField)).as("href"))
      .distinct()
    val kept = e
      .groupBy("href")
      .agg(count(lit(1)).as("__cc_deg"))
      .filter(col("__cc_deg") <= maxDocsPerTarget)
    val ek = e.join(kept.select("href"), Seq("href"))
    ek.as("l")
      .join(ek.as("r"), col("l.href") === col("r.href")
        && col("l.__cc_id") < col("r.__cc_id"))
      .groupBy(col("l.__cc_id").as("doc_a"), col("r.__cc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}

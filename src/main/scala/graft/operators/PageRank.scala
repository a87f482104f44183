package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted PageRank over an edge table, in exact integer arithmetic.
  *
  * Why integers: float PageRank sums per-target contributions, and
  * float addition is not associative — the same graph can hash to
  * different low-order bits at different parallelism. Ranks here are
  * micro-units (1.0 == 1,000,000) and every step is integer multiply /
  * integer floor-divide / integer sum, all of which are exact and
  * order-independent — so the result is bit-identical at any partition
  * count AND replayable in ANSI SQL (the g01 gate unrolls the same
  * iterations as CTEs; `div` here == `//` in DuckDB on non-negatives).
  *
  * Update rule per iteration (damping 0.85 in fixed-point):
  *   contrib(e) = (rank(src) * w(e)) div out_w(src)
  *   rank'(v)   = 150000 + (85 * Σ contrib(in-edges of v)) div 100
  * Dangling mass is dropped (the standard simplification) and isolated
  * targets receive the base term only.
  *
  * Scale shape: the edge table is shuffled ONCE to attach per-source
  * out-weights, then persisted; each iteration is one join of edges
  * against the node-sized rank table (AQE broadcasts it when small —
  * host graphs are ~1e8 rows at CommonCrawl scale, still far below the
  * edge count) plus one aggregation keyed on dst. Rank lineage is
  * truncated every iteration with an eager localCheckpoint (the CC
  * loop's convention — ConnectedComponents.scala — made eager because
  * no other per-round action exists here) so plans stay flat over many
  * iterations. The reference has no graph stage; this backs host-level
  * quality weighting (harmonic-centrality-style corpus curation).
  */
object PageRank {

  /** @param edges (src: string, dst: string, w: long) — self-loops and
    *              non-positive weights are dropped defensively.
    * @return (node: string, rank_micro: long) */
  def run(edges: DataFrame, iterations: Int = 5,
          baseMicro: Long = 150000L, dampPct: Long = 85L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col("w").cast("long").as("w"))
      .where(col("src") =!= col("dst") && col("w") > 0)
    val outW = e.groupBy("src").agg(sum("w").as("out_w"))
    val withOut = e.join(outW, "src")
      .select("src", "dst", "w", "out_w")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iterations) {
      // `div` is SQL integral division (truncating); all operands here
      // are non-negative, so it coincides with DuckDB's floor `//`.
      val contrib = withOut
        .join(ranks, withOut("src") === ranks("node"))
        .selectExpr("dst", "(rank_micro * w) div out_w AS c")
      val inSum = contrib.groupBy("dst").agg(sum("c").as("in_c"))
      ranks = nodes.join(inSum, nodes("node") === inSum("dst"), "left")
        .select(col("node"), coalesce(col("in_c"), lit(0L)).as("in_c"))
        .selectExpr("node",
          s"$baseMicro + ($dampPct * in_c) div 100 AS rank_micro")
        // EAGER: unlike the CC loop there is no per-round action here,
        // so an eager checkpoint both truncates lineage and keeps the
        // persisted edge table alive while it is still useful.
        .localCheckpoint(true)
    }
    val out = ranks
    withOut.unpersist()
    nodes.unpersist()
    out
  }
}

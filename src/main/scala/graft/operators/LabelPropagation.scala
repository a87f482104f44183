package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation for community detection (Raghavan et
  * al. 2007, "Near linear time algorithm to detect community
  * structures in large-scale networks") — the cheap complement to the
  * link-quality signals (g01 PageRank, g03 HITS): groups hosts into
  * densely-linked clusters for per-community curation caps and
  * crawl-frontier dedup.
  *
  * Determinism (the oracle gate's requirement, and reproducibility at
  * any partition count): the classic algorithm breaks vote ties
  * randomly and updates asynchronously — both engine-dependent. This
  * variant is SYNCHRONOUS (iteration t+1 reads only iteration t) with
  * a total vote order: winner = max weighted vote, ties to the
  * lexicographically SMALLEST label. Initial label = the node id;
  * self-loops are dropped (a node voting for itself would just slow
  * convergence); a fixed iteration count replaces the oscillation-
  * prone convergence test (synchronous LPA can 2-cycle on bipartite
  * structures — a bounded `iterations` sidesteps it, and the oracle
  * replays the same unrolled count).
  *
  * Scale shape: per iteration, ONE join shuffle (labels onto edge
  * endpoints) + two vote aggregations — each with map-side partial
  * aggregation, state bounded by (node, candidate-label) pairs, never
  * quadratic; the per-node argmax is a `min(struct(-votes, label))`,
  * no window. Labels are `localCheckpoint`ed each round — the CC
  * convention: iterative self-joins must truncate lineage or the plan
  * doubles per round. Hub skew concentrates a hot node's votes in one
  * aggregation key — the safe direction (partial agg collapses them
  * map-side). */
object LabelPropagation {

  /** Run `iterations` rounds over an edge list; returns one row per
    * non-isolated node: `(node, label)`. `weightCol` scales votes
    * (parallel edges sum); absent means every edge votes 1. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          weightCol: Option[String] = None, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val sym = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"), w.as("w"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v"), w.as("w")))
      .where(col("u") =!= col("v"))
      .groupBy("u", "v").agg(sum("w").as("w"))
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val votes = sym
        .join(labels.select(col("node").as("v"), col("lbl")), "v")
        .groupBy("u", "lbl").agg(sum("w").as("votes"))
      labels = votes
        .groupBy(col("u").as("node"))
        .agg(min(struct((-col("votes")).as("nv"), col("lbl").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("label"))
  }
}

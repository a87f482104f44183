package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983, "Network
  * structure and minimum degree"; the distributed bounded-round
  * formulation follows Montresor et al. 2013, "Distributed k-core
  * decomposition") — the web-graph curation signal the link family
  * (g01 PageRank, g03 HITS, g06 LPA) still lacked: the k-core is the
  * maximal subgraph where every node keeps >= k neighbors, the classic
  * separator between organically-linked hosts and link-farm tendrils /
  * dangling spam chains, which peel off in the first rounds.
  *
  * Semantics: undirected SIMPLE graph — self-loops dropped and
  * parallel edges collapsed up front, so degree = distinct-neighbor
  * count (parallel links must not let a two-host farm fake a core).
  * Each round removes every node whose current degree is < k along
  * with its edges; removals cascade, so the fixpoint needs as many
  * rounds as the longest peel chain. `rounds` bounds the iteration
  * (the LPA/PageRank convention: a fixed unrollable count instead of a
  * driver-side convergence loop, which is also what lets an external
  * SQL engine replay the run exactly); a round that removes nothing
  * makes every later round a no-op, so `rounds` >= the peel depth
  * yields the true k-core — callers size it like CC's `maxIterations`
  * (peel depth is bounded by graph diameter in practice, single
  * digits for web-host graphs).
  *
  * Scale shape: per round, ONE degree aggregation over the symmetric
  * edge view (map-side partial counts — a hub's million edges collapse
  * per-task, never a member list) and two left-semi joins of the edge
  * list against the surviving-node set (node-sized; AQE broadcasts it
  * while it fits). Edges are `localCheckpoint`ed each round — the CC
  * convention: iterative self-reference must truncate lineage or the
  * plan doubles per round. */
object KCore {

  /** Peel up to `rounds` rounds at threshold `k` over an edge list;
    * returns one row per surviving node: `(node, degree)` with
    * `degree` = its distinct-neighbor count INSIDE the surviving
    * subgraph. Fixpoint-aware (the ConnectedComponents convention):
    * edges only ever shrink, so an unchanged edge COUNT is the
    * fixpoint — the loop short-circuits there instead of paying a
    * degree-agg + two semi-joins + checkpoint per leftover round, and
    * an exhausted budget that never reached the fixpoint WARNs (the
    * result is then a partial peel, not a true k-core). */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          k: Int = 3, rounds: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val simple = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    var cur = simple.localCheckpoint(true)
    // count() on eagerly-checkpointed edges is a cached-partition scan,
    // not a recompute — the fixpoint test costs one cheap action/round
    var nEdges = cur.count()
    var converged = nEdges == 0L
    var it = 0
    while (!converged && it < rounds) {
      val sym = cur.select(col("u").as("node"))
        .unionAll(cur.select(col("v").as("node")))
      val alive = sym.groupBy("node").agg(count(lit(1)).as("__deg"))
        .where(col("__deg") >= k).select("node")
        .localCheckpoint(true) // referenced by two semi-joins
      cur = cur
        .join(alive.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(alive.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .localCheckpoint(true)
      val n = cur.count()
      converged = n == nEdges // peel removed nothing => every later round is a no-op
      nEdges = n
      it += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] WARN KCore: peel not at fixpoint after $rounds rounds; " +
          "surviving nodes may still have in-subgraph degree < k " +
          "(size `rounds` >= the peel depth for a true k-core)")
    cur.select(col("u").as("node")).unionAll(cur.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("degree"))
  }
}

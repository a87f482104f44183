package graft

import graft.operators.LabelPropagation
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Pure-Scala reference: same rules (symmetrize + sum parallel
    * weights, drop self-loops, synchronous rounds, winner = max votes
    * then smallest label). */
  private def reference(edges: Seq[(String, String, Long)],
                        iterations: Int): Map[String, String] = {
    val sym = edges.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
      .filter { case (u, v, _) => u != v }
      .groupBy(t => (t._1, t._2)).map { case ((u, v), ts) => (u, v, ts.map(_._3).sum) }
      .toSeq
    var labels = sym.map(_._1).distinct.map(n => n -> n).toMap
    (1 to iterations).foreach { _ =>
      labels = sym.groupBy(_._1).map { case (u, nbrs) =>
        val votes = nbrs.groupBy(t => labels(t._2))
          .map { case (l, ts) => l -> ts.map(_._3).sum }
        u -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
      }
    }
    labels
  }

  private val graph = Seq( // two weighted triangles + a weak bridge
    ("a1", "a2", 2L), ("a2", "a3", 2L), ("a1", "a3", 2L),
    ("b1", "b2", 2L), ("b2", "b3", 2L), ("b1", "b3", 2L),
    ("a3", "b1", 1L),
    ("a1", "a1", 9L)) // self-loop: must be dropped, not vote

  test("matches the brute-force reference at 1, 2, and 3 iterations") {
    val df = graph.toDF("src", "dst", "w")
    (1 to 3).foreach { it =>
      val got = LabelPropagation.run(df, weightCol = Some("w"), iterations = it)
        .as[(String, String)].collect().toMap
      assert(got == reference(graph, it), s"iterations=$it")
    }
  }

  test("weighted votes beat count ties and labels break ties lexicographically") {
    // c is pulled by b (w=5) over a (w=1); d ties a/b 3-3 -> smaller label a
    val df = Seq(("a", "c", 1L), ("b", "c", 5L),
                 ("a", "d", 3L), ("b", "d", 3L)).toDF("src", "dst", "w")
    val got = LabelPropagation.run(df, weightCol = Some("w"), iterations = 1)
      .as[(String, String)].collect().toMap
    assert(got("c") == "b" && got("d") == "a")
  }

  test("unweighted default votes 1 per edge and is partitioning-invariant") {
    val df = graph.map { case (u, v, _) => (u, v) }.toDF("src", "dst")
    val one = LabelPropagation.run(df.coalesce(1), iterations = 3)
      .as[(String, String)].collect().toSeq.sorted
    val many = LabelPropagation.run(df.repartition(13), iterations = 3)
      .as[(String, String)].collect().toSeq.sorted
    assert(one == many)
    assert(one == reference(graph.map { case (u, v, _) => (u, v, 1L) }, 3).toSeq.sorted)
  }

  test("a node with only a self-loop is not in the output") {
    val df = Seq(("x", "x", 1L), ("p", "q", 1L)).toDF("src", "dst", "w")
    val nodes = LabelPropagation.run(df, weightCol = Some("w"), iterations = 2)
      .select("node").as[String].collect().toSet
    assert(nodes == Set("p", "q"))
  }
}

package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** MMR diverse re-ranking (e12): the distributed greedy against a
  * from-scratch driver recompute, plus the diversity property that
  * motivates the operator. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  // deterministic synthetic embeddings: two tight bundles + spread
  private def vec(id: Long): Array[Double] = {
    val base = (id % 3) match {
      case 0 => Array(1.0, 0.1, 0.0, 0.0)
      case 1 => Array(0.0, 1.0, 0.1, 0.0)
      case _ => Array(0.1, 0.0, 1.0, 0.1)
    }
    base.zipWithIndex.map { case (x, i) => x + 0.01 * ((id * (i + 3)) % 7) }
  }

  test("mmrRerank equals a driver-side greedy recompute") {
    val ids = (0L until 40L).toSeq
    val df = ids.map(i => (i, vec(i).map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    val out = Similarity.mmrRerank(queries, df, "vec_id", "vec_id", "embedding",
        kCand = 10, kOut = 5, lambdaRel = 0.7, lambdaDiv = 0.3)
      .select("query_id", "mmr_rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }

    for (q <- 0L until 3L) {
      val qv = vec(q)
      val rel = ids.filter(_ != q).map(i => (i, cos(qv, vec(i))))
        .sortBy { case (i, r) => (-r, i) }.take(10)
      var selected = List.empty[Long]
      for (_ <- 1 to 5) {
        val best = rel.filterNot(c => selected.contains(c._1)).map { case (i, r) =>
          val pen = if (selected.isEmpty) 0.0
            else selected.map(s => cos(vec(i), vec(s))).max
          (i, 0.7 * r - 0.3 * pen)
        }.minBy { case (i, sc) => (-sc, i) }
        selected = selected :+ best._1
      }
      assert(out(q) === selected, s"query $q")
    }
  }

  test("MMR selection diverges from plain top-k when candidates are redundant") {
    // a bundle of near-duplicates along axis 1 (rel ~0.82, intra-sim
    // ~1) plus an orthogonal bundle (rel ~0.57, sim-to-first ~0): the
    // diversity penalty makes round 2 jump bundles, which plain top-k
    // never does. 0.7*0.57 - 0.3*0 > 0.7*0.82 - 0.3*1.
    val rows: Seq[(Long, Seq[Float])] =
      Seq((0L, Seq(0.82f, 0.57f, 0f, 0f))) ++
        (1L to 8L).map(i => i -> Seq(1f, 0f, 0.001f * i, 0f)) ++
        (9L to 11L).map(i => i -> Seq(0f, 1f, 0f, 0.001f * i))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") === 0)
    val topk = Similarity.bruteForceTopK(queries, df, "vec_id", "vec_id", "embedding", 5)
      .select("neighbor_id").as[Long].collect().toSet
    val mmr = Similarity.mmrRerank(queries, df, "vec_id", "vec_id", "embedding",
        kCand = 10, kOut = 5).select("neighbor_id").as[Long].collect().toSet
    assert(topk.forall(_ <= 8L), "plain top-5 stays in the redundant bundle")
    assert(mmr.exists(_ >= 9L), "MMR should cross into the orthogonal bundle")
    assert(mmr !== topk, "diversity term should alter the redundant top-5")
  }

  test("hardNegatives keeps only the [lo, hi) band, ranked and tie-broken") {
    // anchor (1,0); corpus: near-dup (cos 1.0, excluded by hi),
    // in-band at cos .5 twice (tie -> smaller id first), in-band .25
    // exactly at lo (included), below-band orthogonal (excluded)
    val r2 = math.sqrt(3.0) / 2.0
    val corpus = Seq(
      (10L, Array(1.0, 0.0)),            // cos 1.0 -> >= hi, out
      (11L, Array(0.5, r2)),             // cos .5, in
      (12L, Array(0.5, -r2)),            // cos .5, in (tie with 11)
      (13L, Array(0.25, math.sqrt(1 - 0.0625))), // cos .25 == lo, in
      (14L, Array(0.0, 1.0))             // cos 0, out
    ).toDF("vec_id", "embedding")
    val anchors = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(anchors, corpus, "vec_id", "vec_id",
        "embedding", k = 5, lo = 0.25, hi = 0.99)
      .orderBy("rank")
      .select("rank", "negative_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 11L), (2L, 12L), (3L, 13L)))
    // k truncates; partitioning leaves the band and order unchanged
    val k1 = Similarity.hardNegatives(anchors, corpus.repartition(7),
        "vec_id", "vec_id", "embedding", k = 1, lo = 0.25, hi = 0.99)
      .select("negative_id").as[Long].collect().toSeq
    assert(k1 == Seq(11L))
  }
}

package graft

import graft.operators.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("k=2 peels a tendril chain off a triangle, cascading over rounds") {
    // triangle 1-2-3 with tail 3-4-5: node 5 (deg 1) peels in round 1,
    // which EXPOSES node 4 (deg drops 2 -> 1) for round 2 — the result
    // is reachable only through the cascade, not a single degree cut.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = KCore.run(edges, k = 2, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // one round is NOT enough — the single degree cut keeps node 4
    val oneRound = KCore.run(edges, k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(oneRound.map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("rounds beyond the fixpoint are no-ops") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val at3 = KCore.run(edges, k = 2, rounds = 3).orderBy("node").collect().toSeq
    val at6 = KCore.run(edges, k = 2, rounds = 6).orderBy("node").collect().toSeq
    assert(at3 === at6)
  }

  test("parallel edges collapse and self-loops drop before degrees count") {
    // 1-2 three times (both orientations) + a self-loop: true degree 1
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L)).toDF("src", "dst")
    assert(KCore.run(edges, k = 2, rounds = 2).isEmpty)
    val k1 = KCore.run(edges, k = 1, rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(k1 === Seq((1L, 1L), (2L, 1L)))
  }

  test("an entirely sub-k graph peels to empty without error") {
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    assert(KCore.run(edges, k = 3, rounds = 4).isEmpty)
  }

  test("partitioning invariance") {
    val edges = (0L until 60L).map(i => (i % 13, (i * 7) % 17))
      .toDF("src", "dst")
    val narrow = KCore.run(edges, k = 3, rounds = 5)
      .orderBy("node").collect().toSeq
    val wide = KCore.run(edges.repartition(17), k = 3, rounds = 5)
      .orderBy("node").collect().toSeq
    assert(narrow === wide && narrow.nonEmpty)
  }
}

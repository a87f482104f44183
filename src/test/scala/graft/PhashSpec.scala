package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual image hashing + Hamming near-dup clusters (m06):
  * the hash against a from-scratch recompute of the synthesis
  * formula, and the banded/CC cluster path against brute-force
  * union-find over the exact Hamming graph. */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def bruteHash(id: Long): Long = {
    val gray = (0 until 64).map(i =>
      ((i * 4 + id) % 256) + ((i * 2 + id * 3) % 256) + ((i + id * 7) % 256))
    val s = gray.sum
    var h = 0L
    for (i <- 0 until 63) if (gray(i) * 64 > s) h |= (1L << i)
    h
  }

  test("imagePhash matches a brute-force recompute of the synthesis formula") {
    val ids = Seq(0L, 3L, 6L, 9L, 12L, 111L, 255L, 258L)
    val assets = Multimodal.synthesizeAssets(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.imagePhashes(assets)
      .as[(Long, Long)].collect().toMap
    for (id <- ids) assert(got(id) === bruteHash(id), s"id $id")
    // bit 63 must never be set (signed-transport guarantee)
    got.values.foreach(h => assert(h >= 0L))
  }

  test("identical pixels at id and id+768 produce identical hashes") {
    // all three channel formulas are linear in id mod 256; 768 is the
    // smallest multiple of 256 that is also a multiple of 3 (image kind)
    val ids = Seq(6L, 774L)
    val assets = Multimodal.synthesizeAssets(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.imagePhashes(assets).as[(Long, Long)].collect().toMap
    assert(got(6L) === got(774L))
  }

  test("phashClusters equals union-find over the brute-force Hamming graph") {
    val ids = (0L until 300L by 3L).toSeq
    val assets = Multimodal.synthesizeAssets(ids.toDF("doc_id"), "doc_id")
    val out = Multimodal.phashClusters(assets, maxHamming = 2)
      .select("asset_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val sigs = ids.map(id => id -> bruteHash(id)).toMap
    val par = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (par(r) != r) r = par(r); r }
    for (a <- ids; b <- ids if a < b
         if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 2) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = ids.groupBy(find).map { case (root, ms) => root -> ms.size.toLong }
    assert(out.keySet === ids.toSet)
    for (id <- ids) {
      assert(out(id)._1 === find(id), s"cluster of $id")
      assert(out(id)._2 === sizes(find(id)), s"cluster size of $id")
    }
    // the fixture must actually exercise merging, not just singletons
    assert(sizes.values.exists(_ > 1))
  }
}

package graft

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** MinHash semantics, mirroring the reference's own unit assertions
  * (reference: tests/test_minhash.py:14-198): determinism, empty-text
  * zeros, seed/ngram sensitivity, and the Jaccard-estimate property. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String, k: Int = 128, ngram: Int = 5, seed: Long = 42L): Array[Long] =
    Seq(text).toDF("t")
      .select(HashFunctions.minhash(TextFunctions.normalizeForDedup(col("t")), k, ngram, seed))
      .head().getSeq[Long](0).toArray

  test("deterministic and length k") {
    val a = sig("the quick brown fox jumps over the lazy dog")
    val b = sig("the quick brown fox jumps over the lazy dog")
    assert(a.length == 128)
    assert(a.sameElements(b))
  }

  test("identical docs -> identical signatures regardless of case/whitespace") {
    val a = sig("Hello   World  Foo")
    val b = sig("hello world\t\tfoo")
    assert(a.sameElements(b))
  }

  test("empty text -> all zeros") {
    assert(sig("").forall(_ == 0L))
  }

  test("seed changes signature") {
    assert(!sig("some document text here").sameElements(sig("some document text here", seed = 7L)))
  }

  test("ngram changes signature") {
    assert(!sig("some document text here").sameElements(sig("some document text here", ngram = 3)))
  }

  test("jaccard estimate tracks true shingle jaccard") {
    // two texts sharing most shingles
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val variant = (1 to 55).map(i => s"tok$i").mkString(" ") + " extra words here now"
    val a = sig(base); val b = sig(variant)
    val est = a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

    def shingles(t: String): Set[String] = {
      val norm = t.toLowerCase.split("\\s+").mkString(" ")
      val bytes = norm.getBytes("UTF-8")
      if (bytes.length < 5) Set(norm)
      else (0 to bytes.length - 5).map(i => new String(bytes, i, 5, "UTF-8")).toSet
    }
    val sa = shingles(base); val sb = shingles(variant)
    val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("disjoint texts -> near-zero estimate") {
    val a = sig((1 to 40).map(i => s"alpha$i").mkString(" "))
    val b = sig((1 to 40).map(i => s"omega$i").mkString(" "))
    val est = a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est < 0.1, s"est=$est")
  }

  test("xxhash64 seed-0 differs from builtin seed-42 but is stable") {
    val df = Seq("abc").toDF("t")
    val s0 = df.select(HashFunctions.xxhash64Seed0(col("t"))).head().getLong(0)
    val s0b = df.select(HashFunctions.xxhash64Seed0(col("t"))).head().getLong(0)
    val s42 = df.select(xxhash64(col("t"))).head().getLong(0)
    assert(s0 == s0b)
    assert(s0 != s42)
  }

  test("simhash: near-dup texts land within small hamming distance") {
    val base = (1 to 50).map(i => s"word$i").mkString(" ")
    val near = (1 to 48).map(i => s"word$i").mkString(" ") + " tail change"
    val far = (1 to 50).map(i => s"other$i").mkString(" ")
    val df = Seq(base, near, far).toDF("t")
    val hs = df.select(HashFunctions.simhash64(TextFunctions.normalizeForDedup(col("t")))).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) <= 12, s"near hamming=${ham(hs(0), hs(1))}")
    assert(ham(hs(0), hs(2)) > 12, s"far hamming=${ham(hs(0), hs(2))}")
  }

  test("charShingleHashes matches string-shingle distinct sets (ascii + CJK + short)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq("hello world hello", "中文字符测试中文字符", "abc", "", "aaaaaaa",
        "🙂🙃 emoji 🙂🙃 windows") // non-BMP: 4-byte UTF-8 code points
      .toDF("t")
    val got = rows.select(
        size(graft.functions.HashFunctions.charShingleHashes(col("t"), 5)).as("nh"),
        size(array_distinct(graft.functions.TextFunctions.charShingles(col("t"), 5))).as("ns"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // identical strings hash identically; different shingle windows differ
    val hs = rows.select(graft.functions.HashFunctions.charShingleHashes(col("t"), 5).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(hs(2).length == 1 && hs(3).length == 1) // short-string fallback
    assert(hs(4).length == 1)                      // "aaaaaaa": one distinct 5-gram
  }
}

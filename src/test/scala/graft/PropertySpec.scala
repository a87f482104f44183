package graft

import graft.functions.{HashFunctions, TextFunctions}
import graft.operators.Packer
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 test plan), sampled from
  * ScalaCheck generators with fixed seeds (scalatest-plus bridge is not
  * in the offline cache, so sampling is driven manually):
  *  - packer conservation: Σ(len+EOS) == chunks·seqLen + dropped tail
  *  - offsets/seq_lens consistency per chunk
  *  - MinHash estimate within ε of true shingle Jaccard
  *  - rolling hash == Horner fold reference
  */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("packer conservation and run-length metadata invariants") {
    val docsGen = Gen.listOfN(30,
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1, 100))))
    val cases = samples(docsGen.flatMap(d => Gen.chooseNum(4, 64).map(d -> _)), 25)
    assert(cases.nonEmpty)
    cases.foreach { case (docs, seqLen) =>
      val arrays = docs.map(_.toArray)
      val chunks = Packer.packStream(arrays.iterator, seqLen, eosId = 0, padTail = false).toSeq
      val totalTokens = arrays.map(a => a.length + (if (a.isEmpty || a.last != 0) 1 else 0)).sum
      assert(chunks.size == totalTokens / seqLen, s"seqLen=$seqLen")
      chunks.foreach { case (ids, sid, lens, offs) =>
        assert(ids.length == seqLen && sid.length == seqLen)
        assert(lens.sum == seqLen)                               // runs cover the chunk
        assert(offs.toSeq == lens.toSeq.scanLeft(0)(_ + _).init) // offsets = prefix sums
        assert(sid.toSeq == sid.toSeq.sorted)                    // local ids monotonic
      }
    }
  }

  test("minhash estimate tracks true char-shingle jaccard on random words") {
    import spark.implicits._
    val word = Gen.chooseNum(1, 400).map(i => s"w$i")
    val textGen = Gen.chooseNum(10, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val pairs = samples(textGen.flatMap(a => textGen.map(a -> _)), 8)
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val df = Seq(a, b).toDF("t")
        .select(HashFunctions.minhash(TextFunctions.normalizeForDedup(col("t"))).as("sig"))
      val Array(sa, sb) = df.collect().map(_.getSeq[Long](0).toArray)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      def shingles(t: String): Set[Seq[Byte]] = {
        val bytes = t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ").getBytes("UTF-8")
        if (bytes.length < 5) Set(bytes.toSeq)
        else (0 to bytes.length - 5).map(i => bytes.slice(i, i + 5).toSeq).toSet
      }
      val (xa, xb) = (shingles(a), shingles(b))
      val trueJ = if (xa.isEmpty && xb.isEmpty) 1.0
        else xa.intersect(xb).size.toDouble / xa.union(xb).size
      assert(math.abs(est - trueJ) < 0.2, s"est=$est true=$trueJ")
    }
  }

  test("rolling hash equals reference Horner fold for ascii strings") {
    import spark.implicits._
    val strs = samples(Gen.asciiPrintableStr, 30).filter(_.nonEmpty)
    assert(strs.nonEmpty)
    val df = strs.toDF("t").select(col("t"), HashFunctions.rollingHash64(col("t")))
    df.collect().foreach { r =>
      val want = r.getString(0).getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
      assert(r.getLong(1) == want)
    }
  }
}

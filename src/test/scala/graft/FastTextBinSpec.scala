package graft

import graft.operators.FastTextBin

class FastTextBinSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("ftbin_spec").resolve(name).toString

  private val dim = 4
  private def v(fs: Float*): Array[Float] = fs.toArray

  /** Two-language word model: "aa"/"bb" vote lang a, "cc"/"dd" vote
    * lang b, "zz" shared. */
  private def writeFixture(path: String, minn: Int = 0, maxn: Int = 0,
                           wordNgrams: Int = 1,
                           bucketRows: Map[Int, Array[Float]] = Map.empty,
                           bucket: Int = 16): Unit =
    FastTextBin.write(path, dim = dim, bucket = bucket, minn = minn,
      maxn = maxn, wordNgrams = wordNgrams,
      wordRows = Seq(
        FastTextBin.Eos -> v(0, 0, 0, 0),
        "aa" -> v(1, 0, 0, 0), "bb" -> v(1, 0, 0, 0),
        "cc" -> v(0, 1, 0, 0), "dd" -> v(0, 1, 0, 0),
        "zz" -> v(0.5f, 0.5f, 0, 0)),
      labelRows = Seq(
        "__label__a" -> v(4, 0, 0, 0),
        "__label__b" -> v(0, 4, 0, 0)),
      bucketRows = bucketRows)

  test("hash matches the published FNV-1a vectors incl. the sign-extended byte rule") {
    val p = tmp("h.bin"); writeFixture(p)
    val m = FastTextBin.read(p)
    assert(m.hash("a") === 0xe40c292c) // canonical FNV-1a test vector
    assert(m.hash("abc") === 0x1a47e90b) // canonical FNV-1a test vector
    // bytes >= 0x80 XOR sign-extended (fastText's int8_t cast):
    assert(m.hash("日本") === -130579887)
    assert(m.hash("ø") === 737824254)
  }

  test(".bin round-trip: args, dict, and matrices load back exactly") {
    val p = tmp("rt.bin"); writeFixture(p, minn = 2, maxn = 3, wordNgrams = 2)
    val m = FastTextBin.read(p)
    assert(m.dim === dim && m.bucket === 16 && m.minn === 2 && m.maxn === 3)
    assert(m.wordNgrams === 2 && m.nwords === 6)
    assert(m.words.keySet === Set(FastTextBin.Eos, "aa", "bb", "cc", "dd", "zz"))
    assert(m.labels.toSeq === Seq("__label__a", "__label__b"))
    assert(m.input.length === (6 + 16) * dim)
    assert(m.output.length === 2 * dim)
    assert(m.input.slice(m.words("aa") * dim, m.words("aa") * dim + dim)
      .toSeq === Seq(1f, 0f, 0f, 0f))
  }

  test("supervised predict: majority language wins; probs are a softmax") {
    val p = tmp("pred.bin"); writeFixture(p)
    val m = FastTextBin.read(p)
    val (la, pa) = m.predict("aa bb aa")
    assert(la === "__label__a" && pa > 0.9)
    val (lb, _) = m.predict("cc dd")
    assert(lb === "__label__b")
    // shared word only: scores tie -> first label wins (fastText order)
    val (lt, pt) = m.predict("zz")
    assert(lt === "__label__a" && math.abs(pt - 0.5) < 1e-9)
    // empty text: the reference wrapper's unknown fallback
    assert(m.predict("") === (("__label__unknown", 0.0)))
  }

  test("subword n-grams: BOW/EOW wrapping, minn..maxn, no bare-BOW 1-gram") {
    val p = tmp("sub.bin"); writeFixture(p, minn = 2, maxn = 3)
    val m = FastTextBin.read(p)
    // "<ab>" 2-grams: "<a","ab","b>"; 3-grams: "<ab","ab>" — 5 total
    assert(m.subwordIds("ab").length === 5)
    // UTF-8: continuation bytes never start an n-gram and always
    // travel with their lead byte; "<日>" yields 2-grams "<日","日>"
    // and 3-gram "<日>" — 3 total
    assert(m.subwordIds("日").length === 3)
    // OOV token routes through bucket rows ONLY: zero bucket rows give
    // a zero hidden contribution, so prediction follows in-dict words
    val (l1, _) = m.predict("aa oov")
    assert(l1 === "__label__a")
  }

  test("OOV subword buckets steer prediction when their rows are non-zero") {
    // place mass for lang b on EVERY bucket row: any OOV token then
    // votes b regardless of which buckets its n-grams hash into
    val rows = (0 until 16).map(b => b -> v(0, 1, 0, 0)).toMap
    val p = tmp("oov.bin"); writeFixture(p, minn = 2, maxn = 3, bucketRows = rows)
    val m = FastTextBin.read(p)
    val (l, _) = m.predict("unseen")
    assert(l === "__label__b")
  }

  test("word-ngram hashes extend the bag deterministically") {
    val p1 = tmp("wn1.bin"); writeFixture(p1, wordNgrams = 2)
    val m1 = FastTextBin.read(p1)
    val ids = m1.lineIds("aa bb")
    // word ids (2) + EOS id + bigram hashes: (aa,bb) and (bb,</s>)
    assert(ids.length === 5)
    assert(ids.count(_ >= m1.nwords) === 2)
    assert(m1.lineIds("aa bb").toSeq === ids.toSeq) // deterministic
  }

  test("word-ngram hashes SIGN-extend int32 token hashes (fastText's int32 -> uint64)") {
    // real fastText stores token hashes in a vector<int32_t> and
    // converts each with `uint64_t h = hashes[i]` — SIGN extension.
    // The difference vs zero-extension lives in the high 32 bits, so
    // the bucket must be non-power-of-two for the modulus to fold it
    // into the id (2,000,000 is fastText's default bucket; a 2^k
    // fixture bucket would mask the bug).
    val m = FastTextBin.FtModel(dim = 1, bucket = 2000000, minn = 0,
      maxn = 0, wordNgrams = 2, nwords = 1,
      words = Map(FastTextBin.Eos -> 0), labels = Array("__label__a"),
      input = new Array[Float](1), output = new Array[Float](1))
    assert(m.hash("日本") === -130579887) // top bit set: the case that diverges
    // bigram (日本, </s>): sign-extended accumulation lands in bucket
    // 346020; zero-extension would give 132516 (verified externally
    // against the fastText hash recipe)
    assert(m.lineIds("日本").toSeq === Seq(0, 1 + 346020))
  }

  test(".ftz: exact-PQ quantized model decodes to the dense matrices and predicts identically") {
    val pd = tmp("dense.bin"); writeFixture(pd)
    val dense = FastTextBin.read(pd)
    val pq = tmp("quant.ftz")
    FastTextBin.writeQuantized(pq, dim = dim, bucket = 16, minn = 0,
      maxn = 0, wordNgrams = 1,
      wordRows = Seq(
        FastTextBin.Eos -> v(0, 0, 0, 0),
        "aa" -> v(1, 0, 0, 0), "bb" -> v(1, 0, 0, 0),
        "cc" -> v(0, 1, 0, 0), "dd" -> v(0, 1, 0, 0),
        "zz" -> v(0.5f, 0.5f, 0, 0)),
      labelRows = Seq(
        "__label__a" -> v(4, 0, 0, 0),
        "__label__b" -> v(0, 4, 0, 0)),
      qnorm = false, qout = true)
    val m = FastTextBin.read(pq)
    // the exact quantizer's centroids ARE the distinct sub-vectors, so
    // the eager decode reproduces the dense matrices bit-for-bit
    assert(m.input.toSeq === dense.input.toSeq)
    assert(m.output.toSeq === dense.output.toSeq)
    Seq("aa bb aa", "cc dd", "zz", "aa oov cc cc").foreach { t =>
      assert(m.predict(t) === dense.predict(t), s"diverged on '$t'")
    }
  }

  test(".ftz: qnorm codes per-row norms; predictions match at float tolerance") {
    val pd = tmp("dense2.bin"); writeFixture(pd)
    val dense = FastTextBin.read(pd)
    val pq = tmp("qnorm.ftz")
    FastTextBin.writeQuantized(pq, dim = dim, bucket = 16, minn = 0,
      maxn = 0, wordNgrams = 1,
      wordRows = Seq(
        FastTextBin.Eos -> v(0, 0, 0, 0), // zero row: alpha 0 branch
        "aa" -> v(1, 0, 0, 0), "bb" -> v(1, 0, 0, 0),
        "cc" -> v(0, 1, 0, 0), "dd" -> v(0, 1, 0, 0),
        "zz" -> v(0.5f, 0.5f, 0, 0)),
      labelRows = Seq(
        "__label__a" -> v(4, 0, 0, 0),
        "__label__b" -> v(0, 4, 0, 0)),
      qnorm = true, qout = true)
    val m = FastTextBin.read(pq)
    Seq("aa bb aa", "cc dd", "zz").foreach { t =>
      val (ld, pd2) = dense.predict(t)
      val (lq, pq2) = m.predict(t)
      assert(lq === ld, s"label diverged on '$t'")
      assert(math.abs(pq2 - pd2) < 1e-5, s"prob diverged on '$t': $pq2 vs $pd2")
    }
  }

  test("pruned dictionary: bucket ids remap through pruneidx; absent ids drop") {
    // unit pin on the pushHash rule: bigram(日本,</s>) hashes to bucket
    // 346020 (mod 2,000,000); with that bucket kept at pruned row 0 the
    // line id is nwords + 0, with it pruned away the ngram contributes
    // nothing
    def model(pi: Option[Map[Int, Int]]) = FastTextBin.FtModel(
      dim = 1, bucket = 2000000, minn = 0, maxn = 0, wordNgrams = 2,
      nwords = 1, words = Map(FastTextBin.Eos -> 0),
      labels = Array("__label__a"),
      input = new Array[Float](2), output = new Array[Float](1),
      pruneIdx = pi)
    assert(model(Some(Map(346020 -> 0))).lineIds("日本").toSeq === Seq(0, 1))
    assert(model(Some(Map.empty)).lineIds("日本").toSeq === Seq(0))
    // file-level: a pruned .ftz round-trips dict + prune index and the
    // kept bucket's row steers prediction (mass for label b on pruned
    // row 0 = original bucket 346020)
    val p = tmp("pruned.ftz")
    FastTextBin.writeQuantized(p, dim = 2, bucket = 2000000, minn = 0,
      maxn = 0, wordNgrams = 2,
      wordRows = Seq(FastTextBin.Eos -> Array(0f, 0f),
        "日本" -> Array(0f, 0f)),
      labelRows = Seq("__label__a" -> Array(2f, 0f),
        "__label__b" -> Array(0f, 2f)),
      bucketRows = Map(346020 -> Array(0f, 3f)),
      pruneIdx = Seq(346020 -> 0))
    val m = FastTextBin.read(p)
    assert(m.pruneIdx === Some(Map(346020 -> 0)))
    val (l, _) = m.predict("日本")
    assert(l === "__label__b") // only the kept ngram row carries mass
  }

  test("predictDf appends (label, prob) per row with null propagation") {
    import spark.implicits._
    val p = tmp("df.bin"); writeFixture(p)
    val m = FastTextBin.read(p)
    val df = Seq((1L, "aa bb"), (2L, "cc dd cc"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = FastTextBin.predictDf(df, "text", m).orderBy("id").collect()
    assert(out(0).getString(2) === "__label__a")
    assert(out(1).getString(2) === "__label__b")
    assert(out(1).getDouble(3) > 0.9)
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("loader rejects non-fastText files") {
    val bad = tmp("bad.bin")
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      Array.fill[Byte](64)(7))
    val e = intercept[IllegalArgumentException](FastTextBin.read(bad))
    assert(e.getMessage.contains("magic"))
  }
}

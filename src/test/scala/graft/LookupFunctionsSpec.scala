package graft

import graft.functions.LookupFunctions
import org.apache.spark.sql.functions._

class LookupFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val unk = ""
  private val vocab = Map("the" -> -0.5, "cat" -> -1.25, "sat" -> -2.0)
  private val biLog = Map("the cat" -> -0.1, s"cat $unk" -> -0.7, s"$unk the" -> -0.9)
  private val defLog = Map("the" -> -3.0, "cat" -> -3.5, "sat" -> -4.0)

  private val docs = Seq(
    "the cat sat",          // all in vocab
    "the cat sat on a mat", // oov tail
    "zzz yyy",              // all oov
    "the",                  // single token -> no bigrams
    "",                     // split("") = [""] -> one oov token
    null                    // null text -> null toks
  ).toDF("text").withColumn("toks",
    when(col("text").isNotNull, split(col("text"), " ")))

  test("unigramLogSum matches the HOF coalesce/element_at formulation bit-for-bit") {
    val lit_ = typedLit(vocab)
    val hof = aggregate(transform(
      transform(col("toks"), x => when(element_at(lit_, x).isNotNull, x).otherwise(lit(unk))),
      x => coalesce(element_at(lit_, x), lit(-9.75))), lit(0.0), (a, x) => a + x)
    val got = docs.select(
      LookupFunctions.unigramLogSum(col("toks"), vocab, unk, -9.75).as("fast"),
      hof.as("ref")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("bigramLogSum matches the HOF chain bit-for-bit (bi -> per-word def -> const)") {
    val vLit = typedLit(vocab)
    val biLit = typedLit(biLog)
    val defLit = typedLit(defLog)
    val tu = transform(col("toks"), x =>
      when(element_at(vLit, x).isNotNull, x).otherwise(lit(unk)))
    val hof = when(size(col("toks")) >= 2,
      aggregate(transform(sequence(lit(1), size(tu) - 1), i =>
        coalesce(element_at(biLit,
            concat(element_at(tu, i), lit(" "), element_at(tu, i + 1))),
          element_at(defLit, element_at(tu, i)), lit(-11.5))),
        lit(0.0), (a, x) => a + x))
    val fast = when(size(col("toks")) >= 2,
      LookupFunctions.bigramLogSum(col("toks"), vocab.keys, biLog, defLog, -11.5, unk))
    val got = docs.select(fast.as("fast"), hof.as("ref")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("trigramBackoffLogSum matches the HOF chain bit-for-bit (tri -> bi -> uni)") {
    val triLog = Map("the cat sat" -> -0.05, s"cat sat $unk" -> -0.15)
    val biLog2 = Map("cat sat" -> -0.3, s"sat $unk" -> -0.6, s"$unk $unk" -> -0.8)
    val uniLog = Map("the" -> -5.0, "cat" -> -5.5, "sat" -> -6.0, unk -> -7.0)
    val vLit = typedLit(vocab)
    val triLit = typedLit(triLog)
    val biLit = typedLit(biLog2)
    val uniLit = typedLit(uniLog)
    val tu = transform(col("toks"), x =>
      when(element_at(vLit, x).isNotNull, x).otherwise(lit(unk)))
    val hof = when(size(col("toks")) >= 3,
      aggregate(transform(sequence(lit(1), size(tu) - 2), i =>
        coalesce(
          element_at(triLit, concat(element_at(tu, i), lit(" "),
            element_at(tu, i + 1), lit(" "), element_at(tu, i + 2))),
          element_at(biLit, concat(element_at(tu, i + 1), lit(" "),
            element_at(tu, i + 2))),
          element_at(uniLit, element_at(tu, i + 2)))),
        lit(0.0), (a, x) => a + x))
    val fast = when(size(col("toks")) >= 3,
      LookupFunctions.trigramBackoffLogSum(col("toks"), vocab.keys,
        triLog, biLog2, uniLog, unk))
    val got = docs.select(fast.as("fast"), hof.as("ref")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    // the fold itself (unguarded): n<3 gives 0.0, null array gives null
    val raw = docs.select(LookupFunctions.trigramBackoffLogSum(col("toks"),
      vocab.keys, triLog, biLog2, uniLog, unk)).collect()
    assert(raw(3).getDouble(0) == 0.0) // "the": one token
    assert(raw(5).isNullAt(0))         // null text
  }

  test("bigramLogSum: n<2 gives 0.0, null array gives null, empty def table falls to const") {
    val out = docs.select(LookupFunctions.bigramLogSum(
      col("toks"), vocab.keys, biLog, Map.empty, -11.5, unk).as("s")).collect()
    assert(out(3).getDouble(0) == 0.0) // "the" — single token
    assert(out(5).isNullAt(0))         // null text
    // "zzz yyy" -> unk unk -> no bi entry, no def entry -> const
    assert(out(2).getDouble(0) == -11.5)
  }

  test("unkMapTokens maps oov to unk and is stable across rows") {
    val out = docs.where(col("toks").isNotNull).select(
      LookupFunctions.unkMapTokens(col("toks"), vocab.keys, unk).as("tu"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("the", "cat", "sat"))
    assert(out(1) == Seq("the", "cat", "sat", unk, unk, unk))
    assert(out(2) == Seq(unk, unk))
  }
}

package graft

import graft.operators.Decontamination
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "one two three four five six"),          // leaked verbatim below
    (2L, "seven eight nine ten eleven twelve"),   // clean
    (3L, "tiny doc"),                             // <5 words: whole-text gram
    (4L, "ONE two  three FOUR five six extra")    // shares normalized 5-grams with 1
  ).toDF("doc_id", "text")

  private val evalSet = Seq(
    (100L, "one two three four five six"),
    (101L, "tiny doc")
  ).toDF("doc_id", "text")

  test("overlapReport counts distinct shared word-5grams; clean docs score 0") {
    val r = Decontamination.overlapReport(corpus, evalSet, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    // doc 1: grams {"one two three four five", "two three four five six"} both leaked
    // doc 4 normalizes (case + whitespace) to share both of doc 1's grams
    // doc 3: whole-text gram "tiny doc" leaked via eval doc 101
    assert(r === Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true), (4L, 2L, true)))
  }

  test("decontaminate anti-joins the flagged rows; minOverlap raises the bar") {
    val kept = Decontamination.decontaminate(corpus, evalSet, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Seq(2L))
    // requiring >=2 shared grams lets the single-gram doc 3 through
    val lenient = Decontamination
      .decontaminate(corpus, evalSet, "doc_id", "text", n = 5, minOverlap = 2L)
      .select("doc_id").as[Long].collect().sorted
    assert(lenient === Seq(2L, 3L))
  }

  test("bloomOverlapReport is bit-identical to overlapReport") {
    val exact = Decontamination.overlapReport(corpus, evalSet, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloomed = Decontamination
      .bloomOverlapReport(corpus, evalSet, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed === exact)
  }

  test("bloom sketch has no false negatives; prefilter prunes non-members") {
    import graft.functions.TextFunctions
    val g = Decontamination.evalGrams(evalSet, "text", 5)
    val bloom = Decontamination.gramBloom(g, "gram", 1000L, 8000L)
    // every inserted gram must pass might_contain
    val misses = g.where(!Decontamination.mightContainHash(bloom, col("gram"))).count()
    assert(misses === 0L)
    // a stream of fresh grams should mostly die at the prefilter
    // (8000 bits / 3 items → fpp is tiny; allow a generous margin)
    val fresh = spark.range(0, 1000).select(xxhash64(col("id")).as("gram"))
    val passed = fresh.where(Decontamination.mightContainHash(bloom, col("gram"))).count()
    assert(passed < 50, s"bloom prefilter passed $passed of 1000 non-members")
  }

  test("bloomOverlapReport with an empty eval set reports all-clean") {
    val r = Decontamination.bloomOverlapReport(
        corpus, evalSet.limit(0), "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    assert(r === Seq((1L, 0L, false), (2L, 0L, false), (3L, 0L, false), (4L, 0L, false)))
  }

  test("repetitionSignals matches hand-computed Gopher fractions") {
    val df = Seq(
      (1L, "a b a b a b"), // 2-grams: ab,ba,ab,ba,ab -> top 3/5; 3-grams: 4 total 2 distinct -> dup 0.5
      (2L, "hello"),       // <n words: single whole-text gram -> dup 0, top 1
      (3L, "w x y z")      // all grams unique -> dup 0; 2-grams unique -> top 1/3
    ).toDF("doc_id", "text")
    val r = Decontamination.repetitionSignals(df, "text")
      .orderBy("doc_id")
      .select("dup_3gram_frac", "top_2gram_frac")
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r(0) === ((0.5, 0.6)))
    assert(r(1) === ((0.0, 1.0)))
    assert(r(2) === ((0.0, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
  }

  test("repetitionSignals propagates NULL text and keeps caller columns") {
    val df = Seq((1L, Option("a a a")), (2L, None)).toDF("doc_id", "text")
    val r = Decontamination.repetitionSignals(df, "text").orderBy("doc_id").collect()
    assert(r(0).getDouble(3) === 1.0) // "a a a": both 2-grams are "a a"
    assert(r(1).isNullAt(2) && r(1).isNullAt(3))
    assert(r(0).schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "dup_3gram_frac", "top_2gram_frac"))
  }
}

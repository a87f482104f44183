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

  test("overlapFlag (stateless literal-array form) matches overlapReport, bloom or not") {
    val expected = Decontamination.overlapReport(corpus, evalSet, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().toSeq
    val evalG = Decontamination.evalGrams(evalSet, "text", n = 5)
    val hashes = evalG.collect().map(_.getLong(0))
    val plain = Decontamination.overlapFlag(corpus, "doc_id", "text", 5, hashes)
      .orderBy("doc_id").collect().toSeq
    assert(plain === expected)
    val bloom = Decontamination.gramBloom(evalG, "gram", 100L, 4096L)
    val guarded = Decontamination
      .overlapFlag(corpus, "doc_id", "text", 5, hashes, Some(bloom))
      .orderBy("doc_id").collect().toSeq
    assert(guarded === expected) // the sketch must be invisible
    // empty eval set: everything clean, both forms
    val none = Decontamination
      .overlapFlag(corpus, "doc_id", "text", 5, Array.empty[Long], None)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(none.forall(_ == ((0L, false))))
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

  test("gopherGate: each rule fires on its crafted document, in chain order") {
    val many = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the cat and that dog have fun with all of them to be sure"
    val docs = Seq(
      (1L, many),                                              // passes everything
      (2L, "too short to pass the word count and that is it"), // too_few_words
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the of"), // mean len < 3
      (4L, (1 to 60).map(i => s"w$i###").mkString(" ")),       // symbols (after len ok? w1###=5 chars)
      (5L, ("- bullet line\n" * 4) + (1 to 60).map(i => s"word$i").mkString(" ") + " the of and"),
      (6L, (1 to 60).map(i => s"word$i").mkString(" ") + " 123 456 the of and"),
      (7L, (1 to 70).map(i => s"mot$i").mkString(" "))          // no stopwords
    ).toDF("doc_id", "text")
    val r = Decontamination.gopherGate(docs, "text")
      .orderBy("doc_id")
      .select("doc_id", "gopher_reason", "gopher_keep").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getBoolean(2)))
    assert(r(0) === ((1L, "ok", true)))
    assert(r(1) === ((2L, "too_few_words", false)))
    assert(r(2) === ((3L, "bad_mean_word_len", false)))
    assert(r(3)._2 == "too_many_symbols")
    // doc 5: 4 of 5 lines are bullets (0.8 <= 0.9) -> bullet rule does
    // NOT fire; it passes through to ok
    assert(r(4) === ((5L, "ok", true)))
    assert(r(5)._2 == "ok") // 2 numeric words of 65 -> alpha frac fine
    assert(r(6) === ((7L, "few_stopwords", false)))
  }

  test("gopherGate boundary: bullet and alpha rules fire when exceeded") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ") + " the of and"
    val docs = Seq(
      (1L, (1 to 10).map(_ => "- b").mkString("\n")),          // all lines bullets
      (2L, (1 to 60).map(_ => "1234").mkString(" ") + " the of and that be")
    ).toDF("doc_id", "text")
    val r = Decontamination.gopherGate(docs, "text")
      .orderBy("doc_id").select("gopher_reason").collect().map(_.getString(0))
    // doc 1 fails word count first (10 words) — chain order matters
    assert(r(0) == "too_few_words")
    assert(r(1) == "low_alpha_ratio")
    val keepAll = Decontamination.gopherGate(
        Seq((3L, base)).toDF("doc_id", "text"), "text")
      .select("gopher_keep").head().getBoolean(0)
    assert(keepAll)
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

  test("semanticDecontaminate drops cosine-near rows, keeps the rest, invariant to partitioning") {
    // corpus: 1/2 colinear with eval (scaled copies -> cosine 1.0),
    // 3 orthogonal, 4 anti-parallel (cosine -1), 5 ~0.707 to eval A
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 3.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 2.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f)),
      (5L, Array(1.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val evalSet = Seq(
      Tuple1(Array(2.0f, 0.0f, 0.0f)),   // A: catches 1 (cosine 1.0)
      Tuple1(Array(0.0f, 0.5f, 0.0f))    // B: catches 2 (cosine 1.0)
    ).toDF("embedding")
    def kept(c: org.apache.spark.sql.DataFrame): Seq[Long] =
      Decontamination.semanticDecontaminate(c, evalSet, "embedding", tau = 0.9)
        .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(kept(corpus) === Seq(3L, 4L, 5L))
    assert(kept(corpus.repartition(7)) === Seq(3L, 4L, 5L))
    // tau above every cross cosine: nothing dropped
    val all = Decontamination.semanticDecontaminate(
      corpus, evalSet.limit(1), "embedding", tau = 1.5).count()
    assert(all === 5L)
    // tau 0.7: eval A additionally catches 5 (cos = 1/sqrt(2) ~ .7071)
    assert(Decontamination.semanticDecontaminate(
        corpus, evalSet, "embedding", tau = 0.7)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
      === Seq(3L, 4L))
  }

  // ---- fuzzy (whole-doc near-dup) decontamination ----

  private val longA = "the quick brown fox jumps over the lazy dog while " +
    "seventy silver spoons slowly slide across the antique oak table in " +
    "the dusty corner of the abandoned library reading room tonight"
  private val fuzzyCorpus = Seq(
    (1L, longA),                                   // leaked verbatim
    (2L, longA.replace("tonight", "at dawn")),     // near-dup (tail edit)
    (3L, "completely unrelated text about synthesizer firmware updates " +
      "and modular patch cables humming quietly under fluorescent light")
  ).toDF("doc_id", "text")
  private val fuzzyEval = Seq((100L, longA)).toDF("doc_id", "text")

  test("fuzzyOverlapReport convicts verbatim and near-dup leaks, acquits clean docs") {
    val r = Decontamination.fuzzyOverlapReport(
        fuzzyCorpus, fuzzyEval, "doc_id", "text", threshold = 0.8)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getBoolean(3)))
    assert(r(0) === ((1L, 1L, 1.0, true)))              // exact leak: J = 1
    assert(r(1)._1 === 2L && r(1)._2 === 1L && r(1)._4) // near-dup convicted
    assert(r(1)._3 >= 0.8 && r(1)._3 < 1.0)             // ...below verbatim
    assert(r(2) === ((3L, 0L, 0.0, false)))             // clean
  }

  test("fuzzyDecontaminate drops exactly the convicted rows; stateless twin agrees") {
    val kept = Decontamination.fuzzyDecontaminate(
        fuzzyCorpus, fuzzyEval, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Seq(3L))
    // the streaming-shaped brute-force anti-join must reach the same verdicts
    val keptStateless = Decontamination.fuzzyDecontaminateStateless(
        fuzzyCorpus, fuzzyEval, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(keptStateless === kept)
  }

  test("fuzzyOverlapReport counts every matching eval doc and takes max jaccard") {
    val eval2 = fuzzyEval.unionAll(
      Seq((101L, longA.replace("tonight", "at dusk"))).toDF("doc_id", "text"))
    val r = Decontamination.fuzzyOverlapReport(
        fuzzyCorpus, eval2, "doc_id", "text", threshold = 0.8)
      .where(col("doc_id") === 1L).collect().head
    assert(r.getLong(1) === 2L)      // both eval docs convict doc 1
    assert(r.getDouble(2) === 1.0)   // max over matches, not the last one
  }

  test("fuzzyReportGated: brute-force below the bound, band-index rewrite above it") {
    var bruteBuilt = false
    def brute = {
      bruteBuilt = true
      Decontamination.fuzzyOverlapReport(
          fuzzyCorpus, fuzzyEval, "doc_id", "text", threshold = 0.8)
        .orderBy("doc_id")
    }
    // eval side (1 row) within the bound: the brute-force plan is used
    val below = Decontamination.fuzzyReportGated(
      fuzzyCorpus, fuzzyEval, "doc_id", "text", 0.8,
      maxEvalRows = 10L)(brute)
    assert(bruteBuilt)
    // above the bound: the thunk is NEVER built — the guard rewrites
    // to the band-index geometry, and verdicts are identical
    bruteBuilt = false
    val above = Decontamination.fuzzyReportGated(
      fuzzyCorpus, fuzzyEval, "doc_id", "text", 0.8,
      maxEvalRows = 0L)(brute)
    assert(!bruteBuilt, "regime guard must not build the brute-force plan above the bound")
    val a = above.orderBy("doc_id").collect().map(_.toSeq)
    val b = below.orderBy("doc_id").collect().map(_.toSeq)
    assert(a === b, "both geometries must reach identical verdicts")
  }

  test("fuzzyReportGated: corpus x eval PRODUCT bound fires even when the eval side alone is small") {
    // the r9 regime hole: an eval side that is a %-split of the corpus
    // stays under any eval-only bound while |corpus| x |eval| grows
    // quadratically in SF — the guard must watch the product
    var bruteBuilt = false
    def brute = {
      bruteBuilt = true
      Decontamination.fuzzyOverlapReport(
          fuzzyCorpus, fuzzyEval, "doc_id", "text", threshold = 0.8)
        .orderBy("doc_id")
    }
    // eval (1 row) under maxEvalRows, product under maxPairs: brute force
    val below = Decontamination.fuzzyReportGated(
      fuzzyCorpus, fuzzyEval, "doc_id", "text", 0.8,
      maxEvalRows = 10L, maxPairs = 1000L)(brute)
    assert(bruteBuilt)
    // eval still under maxEvalRows, but product (|corpus| x 1) above a
    // 2-pair bound: the thunk is never built, the band index runs, and
    // verdicts are identical across the switch
    bruteBuilt = false
    val above = Decontamination.fuzzyReportGated(
      fuzzyCorpus, fuzzyEval, "doc_id", "text", 0.8,
      maxEvalRows = 10L, maxPairs = 2L)(brute)
    assert(!bruteBuilt, "product guard must not build the brute-force plan above the pair bound")
    val a = above.orderBy("doc_id").collect().map(_.toSeq)
    val b = below.orderBy("doc_id").collect().map(_.toSeq)
    assert(a === b, "both geometries must reach identical verdicts")
  }

  // ---- span-level (surgical) decontamination ----

  test("spanDecontaminate excises only the leaked run; no first-occurrence survivor") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),   // contains the eval passage mid-doc
      (2L, "p q r s t u v"),     // clean
      (3L, "c d e")              // IS the eval passage: trims to empty
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "c d e")).toDF("doc_id", "text")
    val r = Decontamination.spanDecontaminate(corpus, evalDocs, "doc_id", "text",
        window = 3)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r(0) === ((1L, 8L, 3L, "a b f g h"))) // surgical: doc survives minus the run
    assert(r(1) === ((2L, 7L, 0L, "p q r s t u v")))
    assert(r(2) === ((3L, 3L, 3L, "")))          // verbatim leak: nothing survives
  }

  test("spanDecontaminate merges adjacent eval-window hits into one maximal span") {
    val corpus = Seq((1L, "x c d e f y")).toDF("doc_id", "text")
    // two eval passages overlap inside the doc: windows at pos 1 and 2
    val evalDocs = Seq((100L, "c d e"), (101L, "d e f")).toDF("doc_id", "text")
    val r = Decontamination.spanDecontaminate(corpus, evalDocs, "doc_id", "text",
        window = 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) === ((6L, 4L, "x y")))
  }

  test("spanDecontaminateStateless (per-row literal form) matches the join path") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),  // mid-doc hit
      (2L, "p q r s t u v"),    // clean
      (3L, "c d e"),            // verbatim leak -> empty
      (4L, "x c d e f y")       // adjacent windows -> one maximal span
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "c d e"), (101L, "d e f")).toDF("doc_id", "text")
    val joinPath = Decontamination.spanDecontaminate(
      corpus, evalDocs, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect().toSeq
    val fps = Decontamination.evalSpanFingerprints(evalDocs, "doc_id", "text", 3)
    val stateless = Decontamination.spanDecontaminateStateless(
      corpus, "doc_id", "text", window = 3, evalFps = fps)
      .orderBy("doc_id").collect().toSeq
    assert(stateless === joinPath)
    // empty literal set: identity trim — sub-window fps guard exercised
    val none = Decontamination.spanDecontaminateStateless(
      corpus, "doc_id", "text", window = 3, evalFps = Array.empty)
      .agg(sum(col("n_removed"))).collect().head.getLong(0)
    assert(none === 0L)
  }

  test("spanDecontaminationProvenance names hit docs, window counts, and sources") {
    val corpus = Seq(
      (1L, "a b c d e f"),   // hits eval 100 at positions 1,2
      (2L, "p q r s"),       // clean: absent from the report
      (3L, "b c d x c d e")  // hits 100 (pos 0) and 101 (pos 4)
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "b c d e"), (101L, "c d e")).toDF("doc_id", "text")
    // window=3: eval 100 contributes "b c d"/"c d e", eval 101 "c d e"
    val r = Decontamination.spanDecontaminationProvenance(
        corpus, evalDocs, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // doc 1: pos 1 ("b c d") + pos 2 ("c d e") hit; "c d e" is in BOTH
    // eval docs -> 2 sources, exemplar = min = 100
    assert(r(0) === ((1L, 2L, 2L, 100L)))
    // doc 3: pos 0 ("b c d") from 100 only, pos 4 ("c d e") from both
    assert(r(1) === ((3L, 2L, 2L, 100L)))
    assert(r.length === 2) // doc 2 never appears
  }

  test("spanDecontaminate: sub-window docs and empty eval suite are no-ops") {
    val corpus = Seq((1L, "c d"), (2L, "g h i j")).toDF("doc_id", "text")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Decontamination.spanDecontaminate(corpus, emptyEval, "doc_id", "text",
        window = 3)
      .orderBy("doc_id").collect().map(x => (x.getLong(2), x.getString(3)))
    assert(r === Array((0L, "c d"), (0L, "g h i j")))
  }
}

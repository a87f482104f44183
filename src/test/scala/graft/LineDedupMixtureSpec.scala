package graft

import graft.operators.{Dedup, Sampling, TrainedLid}
import org.apache.spark.sql.functions._

class LineDedupMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup keeps first (doc_id, pos) occurrence and reassembles in order") {
    val df = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma"), // in-doc repeat of alpha loses
      (2L, "beta\ndelta"),               // beta lost to doc 1
      (3L, "  alpha  \nepsilon"),        // trimmed form matches doc 1's alpha
      (4L, "alpha\nbeta")                // loses everything
    ).toDF("doc_id", "text")
    val r = Dedup.lineDedup(df, "doc_id", "text").orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r === Seq(
      (1L, "alpha\nbeta\ngamma", 4L, 3L),
      (2L, "delta", 2L, 1L),
      (3L, "epsilon", 2L, 1L),
      (4L, "", 2L, 0L)))
  }

  test("lineDedup result is invariant under input partitioning") {
    val ids = (0L until 200L).toDF("doc_id")
    val synth = TrainedLid.synthFixture(ids, wordsPerDoc = 12)
      .withColumn("text", regexp_replace(col("text"), " ", "\n"))
    val a = Dedup.lineDedup(synth, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.lineDedup(synth.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("temperatureMixture hits budget in expectation and flattens the mixture") {
    val docs = (0L until 4000L).map { i =>
      val src = if (i % 10 == 0) "small" else "big" // 10:90 doc split
      (i, src, 100L) // 100 tokens per doc
    }.toDF("doc_id", "source", "n_tok")
    val kept = Sampling.temperatureMixture(docs, "source", col("n_tok"),
      "doc_id", tokenBudget = 80000.0, temperature = 0.5)
    val bySrc = kept.groupBy("source").agg(sum("n_tok").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T=0.5 targets: z = sqrt(40k)+sqrt(360k); small gets 80k*sqrt(40k)/z ≈ 20k,
    // big ≈ 60k — vs the natural 8k/72k split. Hash-Bernoulli: ±3σ ≈ ±5%.
    assert(math.abs(bySrc("small") - 20000.0) < 3000.0, bySrc.toString)
    assert(math.abs(bySrc("big") - 60000.0) < 6000.0, bySrc.toString)
    // deterministic: same inputs, same kept set, any partitioning
    val again = Sampling.temperatureMixture(docs.repartition(7), "source",
        col("n_tok"), "doc_id", tokenBudget = 80000.0, temperature = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("mixtureReport is the sampler's own accounting") {
    val docs = (0L until 1000L).map(i =>
      (i, s"src${i % 4}", 50L + i % 7)).toDF("doc_id", "source", "n_tok")
    val report = Sampling.mixtureReport(docs, "source", col("n_tok"),
        "doc_id", tokenBudget = 20000.0)
      .orderBy("source").collect()
    val direct = Sampling.temperatureMixture(docs, "source", col("n_tok"),
        "doc_id", tokenBudget = 20000.0)
      .groupBy("source").agg(count(lit(1)).as("kd"), sum("n_tok").as("kt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(report.length == 4)
    report.foreach { r =>
      val (src, p) = (r.getString(0), r.getDouble(3))
      assert(p > 0.0 && p <= 1.0)
      assert(r.getLong(4) === direct(src)._1, s"kept_docs mismatch for $src")
      assert(r.getLong(5) === direct(src)._2, s"kept_tokens mismatch for $src")
    }
  }

  test("mixtureReport reconciles the NULL-source passthrough slice") {
    val docs = Seq(
      (1L, Option("a"), 10L), (2L, Option("a"), 10L),
      (3L, None, 7L), (4L, None, 5L)
    ).toDF("doc_id", "source", "n_tok")
    val r = Sampling.mixtureReport(docs, "source", col("n_tok"),
        "doc_id", tokenBudget = 1e6)
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2),
        x.getLong(4), x.getLong(5))).toSet
    assert(r === Set(
      (Some("a"), 2L, 20L, 2L, 20L),
      (None, 2L, 12L, 2L, 12L)))
  }

  test("temperatureMixture keeps everything when the budget covers the corpus") {
    val docs = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("doc_id", "source", "n_tok")
    val kept = Sampling.temperatureMixture(docs, "source", col("n_tok"),
      "doc_id", tokenBudget = 1e9)
    assert(kept.count() === 2L)
  }

  test("dupPassageReport flags cross-doc shared windows, not in-doc repeats") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, ten + " unique1 tail piece here now"), // shares window [w1..w10] with doc 2
      (2L, ten + " other2 ending words go here"),
      (3L, "all distinct tokens nothing shared at all in this one"),
      (4L, "short doc"),                          // <10 tokens: whole-text window
      (5L, "short doc")                           // identical short text: shared
    ).toDF("doc_id", "text")
    val r = Dedup.dupPassageReport(df, "doc_id", "text", window = 10, stride = 5)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // docs 1/2: 15 tokens -> windows at offsets 0,5 (2 windows); offset-0 shared
    assert(r(0) === ((1L, 2L, 1L)))
    assert(r(1) === ((2L, 2L, 1L)))
    assert(r(2)._3 === 0L)
    assert(r(3) === ((4L, 1L, 1L)))
    assert(r(4) === ((5L, 1L, 1L)))
  }

  test("incrementalMinhash drops only verified near-dups of the indexed corpus") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val corpus = Seq(
      (1L, base + "lambda mu nu xi"),
      (2L, "completely different corpus content about other things entirely here")
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (10L, base + "lambda mu nu XI CHANGED"),  // near-dup of 1 -> dropped
      (11L, "fresh unseen text with nothing in common with anything indexed"),
      (12L, "another novel document sharing no shingles with the corpus")
    ).toDF("doc_id", "text")
    val idx = Dedup.bandIndex(corpus, "doc_id", "text")
    val kept = Dedup.incrementalMinhash(newBatch, "doc_id", "text", corpus, idx,
        threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Seq(11L, 12L))
    // an empty index keeps everything
    val keptAll = Dedup.incrementalMinhash(newBatch, "doc_id", "text",
        corpus.limit(0), Dedup.bandIndex(corpus.limit(0), "doc_id", "text"),
        threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(keptAll === Seq(10L, 11L, 12L))
  }

  test("expectations report: null-hostile predicates, uniqueness, empty input") {
    import graft.operators.Expectations
    val df = Seq(
      (1L, Option("a"), 5L), (2L, None, 50L), (2L, Option("c"), -1L)
    ).toDF("id", "s", "v")
    val r = Expectations.report(df,
        Seq(Expectations.notNull("s"), Expectations.between("v", 0, 10)),
        uniqueCols = Seq("id"))
      .orderBy("check").collect()
      .map(x => (x.getString(0), x.getLong(2), x.getBoolean(4)))
    // NULL s violates not_null; v=50 and v=-1 violate the range; id 2 dups
    assert(r === Seq(("id_unique", 1L, false), ("s_not_null", 1L, false),
      ("v_between", 2L, false)))
    val empty = Expectations.report(df.limit(0),
        Seq(Expectations.notNull("s")), uniqueCols = Seq("id"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getBoolean(4)))
    assert(empty.toSet === Set(("s_not_null", 0L, 0L, true), ("id_unique", 0L, 0L, true)))
  }

  test("d25 cognate fixture confusion is partitioning-invariant and non-trivial") {
    val ids = (0L until 500L).toDF("doc_id")
    def matrix(parts: Int) = {
      val cog = TrainedLid.synthFixture(
        if (parts <= 0) ids else ids.repartition(parts),
        wordLists = TrainedLid.CognateFixtureWordLists,
        salt = "cg", wordsPerDoc = 8)
      val m = TrainedLid.train(cog, "lang", "text")
      TrainedLid.predict(cog, "text", m)
        .groupBy("lang", "lang_pred_model").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred_model")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    }
    val base = matrix(0)
    assert(matrix(11) === base)
    val offDiag = base.filter(x => x._1 != x._2).map(_._3).sum
    assert(offDiag > 0L, s"cognate fixture should confuse some docs: $base")
  }
}

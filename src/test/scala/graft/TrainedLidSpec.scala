package graft

import graft.operators.TrainedLid

class TrainedLidSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("en", "the cat sat on the mat with the hat and that is that"),
    ("en", "this is the english sentence that we wrote for the test"),
    ("en", "the quick brown fox jumps over the lazy dog for fun"),
    ("de", "der hund und die katze sind nicht mit dem mann gegangen"),
    ("de", "das ist der deutsche satz den wir geschrieben haben"),
    ("de", "die sonne scheint und der regen kommt nicht heute"),
    ("fr", "le chat est dans la maison et les enfants sont dehors"),
    ("fr", "la phrase que nous avons ecrite est dans une langue"),
    ("fr", "les jours de la semaine sont dans le calendrier"))
    .toDF("lang", "text")

  test("training recovers the labels of its own corpus") {
    val df = corpus
    val m = TrainedLid.train(df, "lang", "text")
    assert(m.langs.toSeq == Seq("de", "en", "fr")) // sorted
    val preds = TrainedLid.predict(df, "text", m)
      .select("lang", "lang_pred_model").collect()
    assert(preds.forall(r => r.getString(0) == r.getString(1)),
      preds.filterNot(r => r.getString(0) == r.getString(1)).mkString(","))
  }

  test("model is partitioning-invariant and the artifact roundtrips") {
    val df = corpus
    val m1 = TrainedLid.train(df.repartition(1), "lang", "text")
    val m7 = TrainedLid.train(df.repartition(7), "lang", "text")
    assert(m1.langs.sameElements(m7.langs))
    assert(m1.priors.sameElements(m7.priors))
    assert(m1.weights.zip(m7.weights).forall { case (a, b) => a.sameElements(b) })

    val path = java.nio.file.Files.createTempDirectory("lidmodel").toString + "/m"
    TrainedLid.writeModel(spark, path, m1)
    val loaded = TrainedLid.loadModel(spark, path)
    assert(loaded.buckets == m1.buckets && loaded.ngram == m1.ngram)
    val a = TrainedLid.predict(df, "text", m1).select("lang_pred_model").collect().toSeq
    val b = TrainedLid.predict(df, "text", loaded).select("lang_pred_model").collect().toSeq
    assert(a == b)
  }

  test("hard fixture separates the trained model from the stopword heuristic") {
    import org.apache.spark.sql.functions._
    // stopword-free content vocabulary: heuristic scores zero evidence
    // ("und" on every doc) while the char-3gram model still classifies
    val ids = spark.range(0, 400).select(col("id").as("doc_id"))
    val hard = TrainedLid.synthFixture(ids,
      wordLists = TrainedLid.HardFixtureWordLists, salt = "hw")
    val m = TrainedLid.train(hard, "lang", "text")
    val preds = TrainedLid.predict(hard, "text", m)
      .withColumn("heur", graft.operators.TextAnalysis.langIdLabel(col("text")))
      .select(
        sum(when(col("lang_pred_model") === col("lang"), 1L).otherwise(0L)),
        sum(when(col("heur") === col("lang"), 1L).otherwise(0L)),
        sum(when(col("heur") === "und", 1L).otherwise(0L)),
        count(lit(1))).head()
    val (trained, heur, und, n) =
      (preds.getLong(0), preds.getLong(1), preds.getLong(2), preds.getLong(3))
    assert(trained.toDouble / n >= 0.95, s"trained $trained/$n")
    assert(heur == 0L, s"heuristic hit $heur docs on a stopword-free fixture")
    assert(und == n, s"expected und everywhere, got $und/$n")
  }

  test("unseen-language holdout maps to the nearest trained neighbor") {
    import org.apache.spark.sql.functions._
    // trains on the 8 fixture languages, predicts Danish it never saw:
    // every holdout doc must land on sv (shared/near-form function
    // words), under any partitioning — the d20 pinned-oracle premise
    val ids = spark.range(0, 300).select(col("id").as("doc_id"))
    val synth = TrainedLid.synthFixture(ids)
    val m = TrainedLid.train(synth, "lang", "text")
    def preds(parts: Int) = TrainedLid
      .predict(TrainedLid.synthHoldout(ids).repartition(parts), "text", m)
      .groupBy("lang_pred_model").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p1 = preds(1)
    assert(p1 == Map("sv" -> 300L), p1.toString)
    assert(preds(7) == p1)
  }

  test("predict survives an input column named like its internal helper") {
    import org.apache.spark.sql.functions._
    val m = TrainedLid.train(corpus, "lang", "text")
    val df = corpus.withColumn("__lid_grams", lit("caller data"))
    val out = TrainedLid.predict(df, "text", m)
    // the caller's column must come through untouched, plus the prediction
    assert(out.columns.count(_ == "__lid_grams") == 1)
    assert(out.select("__lid_grams").head().getString(0) == "caller data")
    assert(out.where(col("lang_pred_model") === col("lang")).count() == corpus.count())
  }

  test("QualityStep routes labeling through the model artifact when configured") {
    import org.apache.spark.sql.functions._
    val outBase = java.nio.file.Files.createTempDirectory("lidstep").toString
    val m = TrainedLid.train(corpus, "lang", "text")
    TrainedLid.writeModel(spark, s"$outBase/lid_model", m)
    // quality reads the clean step's output dir
    corpus.select(col("text")).write.mode("overwrite").parquet(s"$outBase/cleaned_parquet")
    val cfg = graft.core.Pipeline.PipelineConfig(dataDir = ".", outputBase = outBase,
      langs = Seq("de"), langThreshold = 0.0,
      lidModelPath = Some(s"$outBase/lid_model"))
    graft.operators.PipelineSteps.QualityStep().run(spark, cfg)
    val kept = spark.read.parquet(s"$outBase/quality_parquet")
    // only the 3 German sentences survive the model-labeled lang filter
    assert(kept.count() == 3)
    assert(kept.select("lang").collect().forall(_.getString(0) == "__label__de"))
  }

  test("QualityStep routes labeling through a fastText .bin when configured") {
    import org.apache.spark.sql.functions._
    import graft.operators.FastTextBin
    val outBase = java.nio.file.Files.createTempDirectory("lidbin").toString
    // word-level .bin: German function words vote de, English ones en
    val dim = 4
    def v(fs: Float*): Array[Float] = fs.toArray
    val binPath = s"$outBase/lid_fixture.bin"
    FastTextBin.write(binPath, dim = dim, bucket = 8, minn = 0, maxn = 0,
      wordNgrams = 1,
      wordRows = Seq(FastTextBin.Eos -> v(0, 0, 0, 0),
        "der" -> v(1, 0, 0, 0), "und" -> v(1, 0, 0, 0), "ist" -> v(1, 0, 0, 0),
        "the" -> v(0, 1, 0, 0), "and" -> v(0, 1, 0, 0), "is" -> v(0, 1, 0, 0)),
      labelRows = Seq("__label__de" -> v(4, 0, 0, 0),
        "__label__en" -> v(0, 4, 0, 0)))
    Seq("der hund und katze ist", "the cat and dog is", "und der ist",
        "is the and")
      .toDF("text").write.mode("overwrite").parquet(s"$outBase/cleaned_parquet")
    val cfg = graft.core.Pipeline.PipelineConfig(dataDir = ".", outputBase = outBase,
      langs = Seq("de"), langThreshold = 0.0,
      lidModelPath = Some(binPath))
    graft.operators.PipelineSteps.QualityStep().run(spark, cfg)
    val kept = spark.read.parquet(s"$outBase/quality_parquet")
    // only the 2 German rows survive the .bin-labeled lang filter
    assert(kept.count() == 2)
    assert(kept.select("lang").collect().forall(_.getString(0) == "__label__de"))
  }

  test("committed 48-language artifact: loads, covers all scripts, wired by default") {
    import org.apache.spark.sql.functions._
    // the committed fixture (graft.tools.TrainLidArtifact output) must
    // resolve from the repo CWD and classify a salt-disjoint eval draw
    // of every language correctly — the M1 closure contract
    val path = TrainedLid.defaultArtifactPath.getOrElse(
      fail(s"committed artifact missing: ${TrainedLid.DefaultArtifactDir}"))
    val m = TrainedLid.loadModel(spark, path)
    assert(m.langs.length == 48 && m.buckets == (1 << 12))
    assert(Seq("ar", "he", "ja", "ko", "ru", "uk", "zh", "el",
      "hi", "bn", "ta", "te", "th", "ka", "hy", "fa", "bg",
      "sr", "hr", "sk", "sl", "ms", "ca", "ur", "mr").forall(m.langs.contains))
    val ids = spark.range(0, 400).toDF("doc_id")
    val eval = TrainedLid.synthFixture(ids,
      wordLists = TrainedLid.WideFixtureWordLists, salt = "specsalt")
    val pred = TrainedLid.predict(eval, "text", m)
    assert(pred.where(col("lang_pred_model") === col("lang")).count() == 400)
    // QualityStep picks the artifact up with NO explicit config — the
    // reference's bundled-model default
    val outBase = java.nio.file.Files.createTempDirectory("lidwide").toString
    eval.where(col("lang").isin("zh", "ru")).select(col("text"))
      .write.mode("overwrite").parquet(s"$outBase/cleaned_parquet")
    val cfg = graft.core.Pipeline.PipelineConfig(dataDir = ".", outputBase = outBase,
      langs = Seq("zh"), langThreshold = 0.0)
    graft.operators.PipelineSteps.QualityStep().run(spark, cfg)
    val kept = spark.read.parquet(s"$outBase/quality_parquet")
    val nZh = eval.where(col("lang") === "zh").count()
    assert(nZh > 0 && kept.count() == nZh &&
      kept.select("lang").collect().forall(_.getString(0) == "__label__zh"))
  }

  test("null text predicts a null label instead of crashing the job") {
    val m = TrainedLid.train(corpus, "lang", "text")
    val withNull = Seq((1L, "the cat and the dog"), (2L, null))
      .toDF("id", "text")
    val out = TrainedLid.predict(withNull, "text", m).orderBy("id").collect()
    assert(out(0).getString(2) == "en")
    assert(out(1).isNullAt(2)) // mirrors the heuristic labeler's null row
  }

  test("held-out fixture split: trained model generalizes, beats the 8-lang tie-broken heuristic") {
    import org.apache.spark.sql.functions._
    val fixture = TrainedLid.synthFixture(
      spark.range(0, 400).select(col("id").as("doc_id")))
    assert(fixture.select("lang").distinct().count() == 8)
    // same split rule as Bench: ~20% held out by doc_id hash
    val isEval = pmod(xxhash64(col("doc_id"), lit("lidsplit")), lit(5)) === 0
    val m = TrainedLid.train(fixture.where(!isEval), "lang", "text")
    val eval = fixture.where(isEval)
    val n = eval.count()
    assert(n > 0 && n < 400)
    val hits = TrainedLid.predict(eval, "text", m)
      .where(col("lang_pred_model") === col("lang")).count()
    // disjoint wordlists + 30 words/doc: the NB model should be perfect
    // on docs whose ids it never saw
    assert(hits == n, s"trained accuracy $hits/$n")
  }

  test("unseen language text falls to the nearest trained language deterministically") {
    val m = TrainedLid.train(corpus, "lang", "text")
    val out1 = TrainedLid.predict(Seq(("x", "zzz qqq www")).toDF("lang", "text"), "text", m)
      .select("lang_pred_model").head.getString(0)
    val out2 = TrainedLid.predict(Seq(("x", "zzz qqq www")).toDF("lang", "text"), "text", m)
      .select("lang_pred_model").head.getString(0)
    assert(out1 == out2) // no RNG anywhere in the scorer
    assert(m.langs.contains(out1))
  }
}

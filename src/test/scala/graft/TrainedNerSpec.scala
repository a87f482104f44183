package graft

import graft.operators.{TrainedLid, TrainedNer}
import org.apache.spark.sql.functions._

class TrainedNerSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureAndModel(n: Long) = {
    val ids = (0L until n).toDF("doc_id")
    val toks = TrainedNer.synthTokenFixture(ids)
    (toks, TrainedNer.train(toks))
  }

  test("token NB separates names from content and is partitioning-invariant") {
    val (toks, model) = fixtureAndModel(200L)
    def matrix(df: org.apache.spark.sql.DataFrame) =
      TrainedLid.predict(df, "token", model, "p")
        .groupBy("is_name", "p").agg(count(lit(1)).as("n"))
        .orderBy("is_name", "p")
        .collect().map(r => (r.getBoolean(0), r.getString(1), r.getLong(2))).toSeq
    val base = matrix(toks)
    assert(base === Seq((false, "other", 4800L), (true, "name", 1200L)))
    assert(matrix(toks.repartition(13)) === base)
  }

  test("redact replaces exactly the model-flagged tokens, preserving order") {
    val (_, model) = fixtureAndModel(100L)
    val docs = Seq(
      (1L, "compile james shuffle sarah partition"),
      (2L, "broadcast catalyst parquet"),
      (3L, "karen mary")
    ).toDF("doc_id", "text")
    val r = TrainedNer.redact(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(r(0) === "compile [NAME] shuffle [NAME] partition")
    assert(r(1) === "broadcast catalyst parquet")
    assert(r(2) === "[NAME] [NAME]")
  }

  test("redact survives tabs/newlines without phantom empty tokens") {
    val (_, model) = fixtureAndModel(100L)
    val docs = Seq((1L, "\tcompile\njames  executor")).toDF("doc_id", "text")
    val r = TrainedNer.redact(docs, "doc_id", "text", model).collect().head.getString(1)
    assert(r === "compile [NAME] executor")
  }

  test("model artifact roundtrips through the TrainedLid parquet format") {
    val (_, model) = fixtureAndModel(100L)
    val dir = java.nio.file.Files.createTempDirectory("ner_model").toString
    TrainedLid.writeModel(spark, dir, model)
    val loaded = TrainedLid.loadModel(spark, dir)
    val probe = Seq((1L, "jennifer executor")).toDF("doc_id", "text")
    val a = TrainedNer.redact(probe, "doc_id", "text", model).collect().head.getString(1)
    val b = TrainedNer.redact(probe, "doc_id", "text", loaded).collect().head.getString(1)
    assert(a === b && a === "[NAME] executor")
  }
}

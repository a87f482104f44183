package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("merge loop learns frequent pairs first, deterministically") {
    val freqs = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m1 = BpeTrainer.train(freqs, vocabSize = 34)
    val m2 = BpeTrainer.train(freqs, vocabSize = 34)
    assert(m1.merges == m2.merges)
    // 'est</w>' family dominates (9 occurrences): es or st merges early
    val first = m1.merges.head
    assert(first._1 + first._2 == "es" || first._1 + first._2 == "st", s"first=$first")
  }

  test("encode reconstructs words from learned subwords; OOV chars -> unk") {
    val freqs = Seq("hello" -> 10L, "help" -> 8L, "world" -> 7L)
    val m = BpeTrainer.train(freqs, vocabSize = 60)
    val inv = m.vocab.map(_.swap)
    def decode(ids: Seq[Int]) = ids.map(inv).mkString.replace("</w>", "")
    assert(decode(m.encodeWord("hello")) == "hello")
    assert(decode(m.encodeWord("help")) == "help")
    // word with a char never seen in training
    assert(m.encodeWord("héllo").contains(BpeTrainer.UnkId))
  }

  test("frequent whole words collapse to few tokens, rare words to more") {
    val corpus = (Seq.fill(200)("training") ++ Seq.fill(200)("data")
      ++ Seq.fill(3)("serendipity")).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val m = BpeTrainer.trainFromCorpus(df, "text", vocabSize = 34)
    info(s"merges=${m.merges.size} training=${m.encodeWord("training")} seren=${m.encodeWord("serendipity")}")
    assert(m.encodeWord("training").length <= 2)
    assert(m.encodeWord("serendipity").length > m.encodeWord("training").length)
  }

  test("bpe pipeline path: train writes merges artifact, tokenize packs subword ids") {
    import java.nio.file.Files
    val outBase = Files.createTempDirectory("bpeout").toString
    val docs = (1 to 40).map(i => (s"doc$i", s"training data example number$i training data"))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$outBase/deduped_parquet")
    val cfg = graft.core.Pipeline.PipelineConfig(dataDir = ".", outputBase = outBase,
      vocabSize = 120, tokenizer = "bpe", seqLen = 32)
    graft.operators.PipelineSteps.TrainTokenizerStep().run(spark, cfg)
    assert(spark.read.parquet(s"$outBase/bpe_merges_parquet").count() > 0)
    graft.operators.PipelineSteps.TokenizeStep().run(spark, cfg)
    val packed = spark.read.parquet(s"$outBase/token_packing_parquet")
    assert(packed.count() > 0)
    assert(packed.selectExpr("size(input_ids)").collect().forall(_.getInt(0) == 32))
  }

  test("distributed tokenize appends subword ids per row") {
    val df = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val m = BpeTrainer.trainFromCorpus(df, "text", vocabSize = 30)
    val out = BpeTrainer.tokenize(df, "text", m).orderBy("doc_id").collect()
    assert(out.length == 2)
    val ids1 = out(0).getSeq[Int](2)
    assert(ids1.nonEmpty && !ids1.contains(BpeTrainer.UnkId))
    // token count for "aa ab aa" >= 3 words' worth, deterministic
    val again = BpeTrainer.tokenize(df, "text", m).orderBy("doc_id").collect()
    assert(again(0).getSeq[Int](2) == ids1)
  }
}

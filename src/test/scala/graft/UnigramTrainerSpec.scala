package graft

import graft.operators.UnigramTrainer
import org.apache.spark.sql.functions._

class UnigramTrainerSpec extends SparkSpec {
  import spark.implicits._

  private val freqs = Seq("low" -> 5L, "lower" -> 3L, "lowest" -> 4L,
    "newest" -> 6L, "widest" -> 3L, "new" -> 7L)

  test("training is deterministic and respects the id bound") {
    val m1 = UnigramTrainer.train(freqs, vocabSize = 300)
    val m2 = UnigramTrainer.train(freqs, vocabSize = 300)
    assert(m1.pieces == m2.pieces && m1.vocab == m2.vocab)
    assert(m1.vocab.valuesIterator.max < 300)
    // input order must not matter (the table is sorted internally via
    // score/count ties on the piece string)
    val m3 = UnigramTrainer.train(freqs.reverse, vocabSize = 300)
    assert(m3.pieces == m1.pieces)
  }

  test("Viterbi segmentation prefers probable multi-char pieces over singles") {
    val m = UnigramTrainer.train(freqs, vocabSize = 310)
    // frequent substrings ("est", "new", "low", "▁new"...) must win the
    // budget and the ML segmentation must use SOME multi-char piece —
    // an all-singles segmentation means probabilities did nothing
    val ids = m.encodeWord("newest")
    assert(ids.size < UnigramTrainer.Boundary.length + "newest".length,
      s"got ${ids.size} pieces: $ids")
    val asPieces = ids.map(id => m.vocab.map(_.swap)(id))
    assert(asPieces.exists(_.length > 1), s"pieces: $asPieces")
  }

  test("encode/decode roundtrips, unseen chars ride byte fallback, never unk") {
    val m = UnigramTrainer.train(freqs, vocabSize = 300)
    for (t <- Seq("low lower lowest", "newest new widest",
        "héllo wörld", "漢字 emoji 🙂", "mixed lowﬁ")) {
      val norm = java.text.Normalizer.normalize(t.toLowerCase,
        java.text.Normalizer.Form.NFKC)
      val ids = m.encodeText(norm)
      assert(!ids.contains(UnigramTrainer.UnkId), s"unk in $t")
      assert(m.decode(ids.toSeq) == norm, s"roundtrip of $norm")
    }
  }

  test("model artifact roundtrip preserves pieces, probs, vocab, encoding") {
    val m = UnigramTrainer.train(freqs, vocabSize = 300)
    val dir = java.nio.file.Files.createTempDirectory("uni").toString + "/m"
    UnigramTrainer.writeModel(spark, dir, m)
    val l = UnigramTrainer.loadModel(spark, dir)
    assert(l.pieces == m.pieces && l.vocab == m.vocab)
    assert(l.encodeWord("newest") == m.encodeWord("newest"))
  }

  test("distributed tokenize appends ids and matches the driver encode") {
    val df = Seq((1L, "the newest low table"), (2L, "lower and lowest"))
      .toDF("doc_id", "text")
    val m = UnigramTrainer.trainFromCorpus(df, "text", vocabSize = 300)
    val out = UnigramTrainer.tokenize(df, "text", m)
      .orderBy("doc_id").select("ids").as[Seq[Int]].collect()
    val norm1 = java.text.Normalizer.normalize("the newest low table",
      java.text.Normalizer.Form.NFKC)
    assert(out(0) == m.encodeText(norm1).toSeq)
    assert(out.forall(_.nonEmpty))
  }

  test("characterCoverage cuts rare chars to byte fallback, identity at 1.0") {
    // 'z' and 'q' carry a tiny share of the occurrence mass; at 0.95
    // coverage they must not surface in ANY single or multi piece,
    // and words containing them must still roundtrip via byte ids
    val f = Seq("alpha" -> 50L, "alps" -> 40L, "lapse" -> 30L,
      "zq" -> 1L, "quartz" -> 1L)
    val cut = UnigramTrainer.train(f, vocabSize = 300, characterCoverage = 0.95)
    val pieceChars = cut.pieces.keysIterator
      .flatMap(_.codePoints().toArray.toSeq).map(cp =>
        new String(Character.toChars(cp))).toSet
    assert(!pieceChars.contains("z") && !pieceChars.contains("q"))
    val ids = cut.encodeWord("quartz")
    assert(ids.exists(id => id >= UnigramTrainer.ByteIdBase &&
      id < UnigramTrainer.FirstPieceId)) // byte-fallback ids present
    assert(cut.decode(cut.encodeText("quartz alps")) == "quartz alps")
    // coverage 1.0 is the identity: same model as the default path
    val full = UnigramTrainer.train(f, vocabSize = 300)
    val one = UnigramTrainer.train(f, vocabSize = 300, characterCoverage = 1.0)
    assert(full.pieces == one.pieces && full.vocab == one.vocab)
  }

  test("pruning shrinks an oversized seed to the piece budget") {
    // many distinct words -> large seed; tight budget forces rounds of
    // 25% shrink; singles survive, multis land exactly <= budget
    val wide = (0 until 50).map(i => s"word$i" -> (50L - i))
    val m = UnigramTrainer.train(wide, vocabSize = 280)
    val multis = m.pieces.keys.filter(p => p.codePointCount(0, p.length) > 1)
    val singles = m.pieces.keys.filter(p => p.codePointCount(0, p.length) == 1)
    assert(m.vocab.valuesIterator.max < 280)
    assert(multis.size + singles.size + UnigramTrainer.FirstPieceId <= 280)
  }
}

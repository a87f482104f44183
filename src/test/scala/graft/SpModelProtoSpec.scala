package graft

import graft.operators.{BpeTrainer, SpModelProto, UnigramTrainer}

class SpModelProtoSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("spproto_spec").resolve(name).toString

  private val corpusWords = Seq(
    ("the", 50L), ("them", 20L), ("theme", 8L), ("cat", 30L),
    ("cats", 12L), ("concatenate", 3L), ("dog", 25L), ("dogma", 5L))

  test("unigram .model round-trip preserves pieces, vocab, and every encode") {
    val m = UnigramTrainer.train(corpusWords, vocabSize = 300)
    val p = tmp("uni.model")
    SpModelProto.writeUnigram(p, m)
    val m2 = SpModelProto.loadUnigram(p)
    assert(m2.vocab === m.vocab)
    assert(m2.pieces.keySet === m.pieces.keySet)
    // scores survive as float32 — close, and segmentation-identical below
    m.pieces.foreach { case (piece, lp) =>
      assert(math.abs(m2.pieces(piece) - lp) < 1e-6,
        s"score drift for '$piece': $lp vs ${m2.pieces(piece)}")
    }
    val texts = Seq("the cat", "them dogs", "concatenate dogma themes",
      "unseen wörds with ünïcode", "日本 text", "")
    texts.foreach { t =>
      assert(m2.encodeText(t).toSeq === m.encodeText(t).toSeq, s"encode drift on '$t'")
      assert(m2.decode(m2.encodeText(t).toSeq) === m.decode(m.encodeText(t).toSeq))
    }
  }

  test("bpe .model round-trip preserves vocab and every encode") {
    val m = BpeTrainer.train(corpusWords, vocabSize = 300)
    val p = tmp("bpe.model")
    SpModelProto.writeBpe(p, m)
    val m2 = SpModelProto.loadBpe(p)
    assert(m2.vocab === m.vocab)
    val texts = Seq("the cat", "them dogs", "concatenate dogma themes",
      "unseen wörds with ünïcode", "日本 text", "")
    texts.foreach { t =>
      assert(m2.encodeText(t).toSeq === m.encodeText(t).toSeq, s"encode drift on '$t'")
      assert(m2.decode(m2.encodeText(t).toSeq) === m.decode(m.encodeText(t).toSeq))
    }
  }

  test("piece table carries the reference layout: specials 0-3, bytes 4-259, typed") {
    val m = UnigramTrainer.train(corpusWords, vocabSize = 300)
    val p = tmp("layout.model")
    SpModelProto.writeUnigram(p, m)
    val proto = SpModelProto.read(p)
    assert(proto.modelType === SpModelProto.ModelUnigram)
    assert(proto.pieces(0).piece === "<unk>" &&
      proto.pieces(0).pieceType === SpModelProto.TypeUnknown)
    assert(proto.pieces(1).pieceType === SpModelProto.TypeControl)
    assert(proto.pieces(4).piece === "<0x00>" &&
      proto.pieces(4).pieceType === SpModelProto.TypeByte)
    assert(proto.pieces(259).piece === "<0xFF>")
    assert(proto.pieces.drop(260).forall(_.pieceType === SpModelProto.TypeNormal))
    assert((proto.unkId, proto.bosId, proto.eosId, proto.padId) === ((0, 1, 2, 3)))
    // inspect (the inspect_model.py analog) shows the same table
    val ins = SpModelProto.inspect(spark, p).collect()
    assert(ins.length === proto.pieces.length)
    assert(ins.head.getString(1) === "<unk>")
  }

  test("loader fails fast on a wrong-type load and a byte-block-free model") {
    val m = UnigramTrainer.train(corpusWords, vocabSize = 300)
    val p = tmp("uni2.model")
    SpModelProto.writeUnigram(p, m)
    val e = intercept[IllegalArgumentException](SpModelProto.loadBpe(p))
    assert(e.getMessage.contains("not BPE"))
    // hand-write a model whose pieces lack the byte block
    val bad = tmp("nobytes.model")
    val vocabNoBytes = Map("<unk>" -> 0, "<bos>" -> 1, "<eos>" -> 2,
      "<pad>" -> 3, "x" -> 4)
    // direct write through the piece-table path is guarded by layout
    // checks at LOAD time: serialize via writeUnigram's wire writer
    SpModelProto.writeUnigram(bad,
      UnigramTrainer.UnigramModel(Map("x" -> -1.0), vocabNoBytes))
    val e2 = intercept[IllegalArgumentException](SpModelProto.loadUnigram(bad))
    assert(e2.getMessage.contains("byte-fallback"))
  }
}

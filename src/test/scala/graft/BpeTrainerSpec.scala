package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("merge loop learns frequent pairs first, deterministically") {
    val freqs = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m1 = BpeTrainer.train(freqs, vocabSize = 290)
    val m2 = BpeTrainer.train(freqs, vocabSize = 290)
    assert(m1.merges == m2.merges)
    // 'est</w>' family dominates (9 occurrences): es or st merges early
    val first = m1.merges.head
    assert(first._1 + first._2 == "es" || first._1 + first._2 == "st", s"first=$first")
  }

  test("encode reconstructs words from learned subwords; OOV chars -> byte fallback, never unk") {
    val freqs = Seq("hello" -> 10L, "help" -> 8L, "world" -> 7L)
    val m = BpeTrainer.train(freqs, vocabSize = 320)
    assert(m.decode(m.encodeWord("hello")) == "hello")
    assert(m.decode(m.encodeWord("help")) == "help")
    // chars never seen in training encode as UTF-8 byte tokens and decode
    // back losslessly — the SentencePiece byte_fallback contract
    val oov = m.encodeWord("héllo")
    assert(!oov.contains(BpeTrainer.UnkId))
    assert(oov.exists(id => id >= BpeTrainer.ByteIdBase && id < BpeTrainer.FirstSymbolId))
    assert(m.decode(oov) == "héllo")
  }

  test("byte fallback roundtrips arbitrary UTF-8 (CJK, emoji, ligatures) with zero unk") {
    val m = BpeTrainer.train(Seq("plain" -> 3L), vocabSize = 300)
    for (s <- Seq("漢字テスト", "héllo wörld", "emoji 🙂 test", "ﬁligature")) {
      val ids = s.split("\\s+").toSeq.flatMap(m.encodeWord)
      assert(!ids.contains(BpeTrainer.UnkId), s"unk in $s")
      assert(m.decode(ids) == s, s"roundtrip of $s")
    }
  }

  test("oversized alphabet is capped by frequency: ids stay < vocabSize, decode lossless") {
    // 40 distinct CJK chars but budget for only 10 symbol slots
    // (vocabSize 270 - 260 fixed overhead): the 31 rarest chars must lose
    // their own token and ride byte fallback, never exceed the id bound
    val words = (0 until 40).map(i =>
      new String(Character.toChars(0x4E00 + i)) -> (100L - i))
    val m = BpeTrainer.train(words, vocabSize = 270)
    assert(m.vocab.values.max < 270, s"max id ${m.vocab.values.max}")
    for ((w, _) <- words) {
      val ids = m.encodeWord(w)
      assert(!ids.contains(BpeTrainer.UnkId))
      assert(ids.forall(_ < 270))
      assert(m.decode(ids) == w)
    }
    // infeasible budgets fail fast instead of silently overflowing
    intercept[IllegalArgumentException] {
      BpeTrainer.train(words, vocabSize = 200)
    }
  }

  test("characterCoverage cuts the alphabet by occurrence mass, tail rides byte fallback") {
    // char mass: 'a' 90, 'b' 9, 'z' 1 — coverage 0.9 keeps only 'a'
    // (minimal most-frequent-first prefix reaching 90/100), 0.99 adds
    // 'b', 1.0 keeps all three
    val words = Seq("a" -> 90L, "b" -> 9L, "z" -> 1L)
    def hasCharToken(m: BpeTrainer.BpeModel, c: String) =
      m.vocab.contains(c) && m.vocab(c) >= BpeTrainer.FirstSymbolId
    val m90 = BpeTrainer.train(words, vocabSize = 300, characterCoverage = 0.9)
    assert(hasCharToken(m90, "a") && !hasCharToken(m90, "b") && !hasCharToken(m90, "z"))
    val m99 = BpeTrainer.train(words, vocabSize = 300, characterCoverage = 0.99)
    assert(hasCharToken(m99, "a") && hasCharToken(m99, "b") && !hasCharToken(m99, "z"))
    val mAll = BpeTrainer.train(words, vocabSize = 300)
    assert(hasCharToken(mAll, "z"))
    // cut chars still encode (byte tokens) and decode losslessly
    val ids = m90.encodeWord("z")
    assert(!ids.contains(BpeTrainer.UnkId))
    assert(ids.exists(id => id >= BpeTrainer.ByteIdBase && id < BpeTrainer.FirstSymbolId))
    assert(m90.decode(ids) == "z")
  }

  test("inputSentenceSize trains on the deterministic hash-ordered sample") {
    val corpus = (0 until 60).map(i => (i.toLong, s"row$i sentence with shared words"))
      .toDF("doc_id", "text")
    // the bounded trainer must equal training on the manually-computed
    // hash-min-10 rows — sampling is part of the model's determinism
    // contract, not an approximation knob
    val sampled = BpeTrainer.trainFromCorpus(corpus, "text", vocabSize = 300,
      inputSentenceSize = Some(10))
    val manual = corpus.select(col("text"))
      .orderBy(xxhash64(col("text")), col("text")).limit(10)
    val expected = BpeTrainer.trainFromCorpus(manual, "text", vocabSize = 300)
    assert(sampled.merges == expected.merges && sampled.vocab == expected.vocab)
    // a bound >= corpus size is the identity
    val all = BpeTrainer.trainFromCorpus(corpus, "text", vocabSize = 300,
      inputSentenceSize = Some(1000))
    val unbounded = BpeTrainer.trainFromCorpus(corpus, "text", vocabSize = 300)
    assert(all.merges == unbounded.merges && all.vocab == unbounded.vocab)
  }

  test("NFKC normalization is applied before training and tokenize") {
    // full-width latin and the ﬁ ligature must compose to ascii, so the
    // full-width corpus trains the SAME model as its ascii form and both
    // spellings encode identically
    val ascii = Seq((1L, "file fight file")).toDF("doc_id", "text")
    val wide = Seq((1L, "ﬁle ﬁght ﬁle")).toDF("doc_id", "text") // U+FB01 ligature
    val mAscii = BpeTrainer.trainFromCorpus(ascii, "text", vocabSize = 300)
    val mWide = BpeTrainer.trainFromCorpus(wide, "text", vocabSize = 300)
    assert(mAscii.merges == mWide.merges)
    val outAscii = BpeTrainer.tokenize(ascii, "text", mAscii).select("ids").head.getSeq[Int](0)
    val outWide = BpeTrainer.tokenize(wide, "text", mAscii).select("ids").head.getSeq[Int](0)
    assert(outAscii == outWide && outAscii.nonEmpty)
  }

  test("incremental merge loop is equivalent to the naive full-rescan reference") {
    // the naive loop the incremental trainer replaced: full pair recount
    // + argmax per iteration; must produce the IDENTICAL merge sequence
    def naiveMerges(wordFreqs: Seq[(String, Long)], vocabSize: Int): Seq[(String, String)] = {
      def cps(w: String) = w.map(_.toString).toVector
      var words: Array[(Array[String], Long)] =
        wordFreqs.map { case (w, f) => ((cps(w) :+ "</w>").toArray, f) }.toArray
      val base = scala.collection.mutable.LinkedHashSet[String]("</w>")
      wordFreqs.foreach(_._1.foreach(c => base += c.toString))
      val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      val maxMerges = math.max(0, vocabSize - 4 - 256 - base.size)
      var iter = 0; var exhausted = false
      while (iter < maxMerges && !exhausted) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        words.foreach { case (syms, f) =>
          var i = 0
          while (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1)); pc.update(p, pc.getOrElse(p, 0L) + f); i += 1
          }
        }
        if (pc.isEmpty) exhausted = true
        else {
          val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          merges += best
          val ms = best._1 + best._2
          words = words.map { case (syms, f) =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += ms; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, f)
          }
        }
        iter += 1
      }
      merges.toSeq
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val alphabet = "abcd"
      val words = (1 to 30).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString ->
          (1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toSeq.sortBy(_._1)
      val vocab = 270 + rnd.nextInt(20)
      assert(BpeTrainer.train(words, vocab).merges == naiveMerges(words, vocab),
        s"trial $trial")
    }
  }

  test("frequent whole words collapse to few tokens, rare words to more") {
    val corpus = (Seq.fill(200)("training") ++ Seq.fill(200)("data")
      ++ Seq.fill(3)("serendipity")).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val m = BpeTrainer.trainFromCorpus(df, "text", vocabSize = 290)
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
      vocabSize = 400, tokenizer = "bpe", seqLen = 32)
    graft.operators.PipelineSteps.TrainTokenizerStep().run(spark, cfg)
    assert(spark.read.parquet(s"$outBase/bpe_merges_parquet").count() > 0)
    graft.operators.PipelineSteps.TokenizeStep().run(spark, cfg)
    val packed = spark.read.parquet(s"$outBase/token_packing_parquet")
    assert(packed.count() > 0)
    assert(packed.selectExpr("size(input_ids)").collect().forall(_.getInt(0) == 32))
  }

  test("model artifact roundtrip: write + load preserves merges, vocab, encoding") {
    import java.nio.file.Files
    val df = (1 to 30).map(i => (i.toLong, s"shared words number$i shared words"))
      .toDF("doc_id", "text")
    val m = BpeTrainer.trainFromCorpus(df, "text", vocabSize = 350)
    val path = Files.createTempDirectory("bpe_artifact").toString + "/model"
    BpeTrainer.writeModel(spark, path, m)
    val loaded = BpeTrainer.loadModel(spark, path)
    assert(loaded.merges == m.merges) // ORDER is the model
    assert(loaded.vocab == m.vocab)
    val texts = Seq("shared words number7", "unseen zebra text 新词")
    texts.foreach(t =>
      assert(loaded.encodeText(t).toSeq == m.encodeText(t).toSeq))
  }

  test("distributed tokenize appends subword ids per row") {
    val df = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val m = BpeTrainer.trainFromCorpus(df, "text", vocabSize = 270)
    val out = BpeTrainer.tokenize(df, "text", m).orderBy("doc_id").collect()
    assert(out.length == 2)
    val ids1 = out(0).getSeq[Int](2)
    assert(ids1.nonEmpty && !ids1.contains(BpeTrainer.UnkId))
    // token count for "aa ab aa" >= 3 words' worth, deterministic
    val again = BpeTrainer.tokenize(df, "text", m).orderBy("doc_id").collect()
    assert(again(0).getSeq[Int](2) == ids1)
  }

  test("encodeText matches the regex-split per-occurrence encodeWord formulation") {
    val df = (1 to 30).map(i => (i.toLong, s"shared words number$i shared words"))
      .toDF("doc_id", "text")
    val m = BpeTrainer.trainFromCorpus(df, "text", vocabSize = 350)
    val texts = Seq("shared words number7", "unseen zebra \u65b0\u8bcd \ud83d\ude42",
      "tabs\tand\nnewlines mixed", " lead trail ", "", "   ",
      "nbsp\u00A0is one token", "shared shared shared words")
    texts.foreach { t =>
      val ref = t.split("\\s+").iterator.filter(_.nonEmpty).flatMap(m.encodeWord).toSeq
      assert(m.encodeText(t).toSeq == ref, s"encodeText drift on '$t'")
      // second call exercises the word-cache hit path — must stay identical
      assert(m.encodeText(t).toSeq == ref, s"cached encodeText drift on '$t'")
    }
  }

}

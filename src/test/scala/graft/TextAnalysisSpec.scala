package graft
// (chunking + quantization cases appended at the bottom of this suite)

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Table-driven language-ID scorer: 8 Latin-script languages + the CJK
  * gate, and the parquet-artifact seam for a trained replacement. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    ("en", "the cat is on the mat and that is fine for everyone with time"),
    ("de", "der hund und die katze sind nicht mit dem mann der das sagt"),
    ("fr", "le chien et la maison est une merveille dans les rues et le soir"),
    ("es", "el perro es una maravilla para los gatos y las casas que vemos"),
    ("it", "il cane che corre per la strada con il gatto sono di roma della citta"),
    ("pt", "ele gosta mais dos livros como isso sem muito esforco e muito bom"),
    ("nl", "het huis is een plek van de mensen die niet zijn voor ook maar iets"),
    ("sv", "och att det som detta inte har vilket man och att som detta har"),
    ("zh", "这是一个中文测试文档，其中包含了足够多的汉字内容来触发中日韩检测。"))

  test("classifies 9 languages (8 table-driven + CJK gate) correctly") {
    val df = samples.toDF("lang", "text")
      .select(col("lang"), TextAnalysis.langIdLabel(col("text")).as("pred"))
    df.collect().foreach(r =>
      assert(r.getString(1) == r.getString(0), s"expected ${r.getString(0)}"))
  }

  test("scorer-table parquet artifact roundtrips and drives identical predictions") {
    val path = Files.createTempDirectory("lidmodel").toString + "/table"
    TextAnalysis.writeScorerTable(spark, path)
    val loaded = TextAnalysis.loadScorerTable(spark, path)
    assert(loaded.toMap == TextAnalysis.LangStopwords.toMap)
    val df = samples.toDF("lang", "text")
    val a = df.select(TextAnalysis.langIdLabel(col("text"))).collect().map(_.getString(0)).toSeq
    val b = df.select(TextAnalysis.langIdLabel(col("text"), loaded)).collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("a swapped artifact changes the scorer without code change") {
    val path = Files.createTempDirectory("lidmodel2").toString + "/table"
    TextAnalysis.writeScorerTable(spark, path,
      Seq("xx" -> Seq("zorp", "blat"), "en" -> Seq("the", "and")))
    val loaded = TextAnalysis.loadScorerTable(spark, path)
    val pred = Seq(("t1", "zorp blat zorp")).toDF("id", "text")
      .select(TextAnalysis.langIdLabel(col("text"), loaded)).head.getString(0)
    assert(pred == "xx")
  }

  test("stray UTF-8 continuation byte advances one byte, not two") {
    // ADVICE r3: a malformed lead byte in 0x80-0xBF must not swallow the
    // following byte — here every "the" is preceded by a stray 0x80, and
    // a two-byte skip would eat each 't' and yield zero stopword hits
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val theBytes = "the ".getBytes("UTF-8")
    def labelOf(bytes: Array[Byte]): String =
      graft.functions.LangIdLabel(
        Literal(UTF8String.fromBytes(bytes), org.apache.spark.sql.types.StringType),
        TextAnalysis.LangStopwords, 0.05).eval(null).toString
    assert(labelOf(Array.fill(5)(0x80.toByte +: theBytes).flatten) == "en")
    // a TRUNCATED multi-byte lead (no continuation bytes follow) must
    // also advance one byte, not its declared length
    assert(labelOf(Array.fill(5)(0xc3.toByte +: theBytes).flatten) == "en")
    assert(labelOf(Array.fill(5)(0xe4.toByte +: theBytes).flatten) == "en")
  }

  test("bm25 ranks term-dense docs higher and length-normalizes") {
    val docs = Seq(
      ("d1", "join join join hash"),             // dense in both terms
      ("d2", "join scan scan scan"),             // one hit, diluted
      ("d3", "join scan"),                       // one hit, short doc
      ("d4", "scan merge filter sort")           // no hits
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.bm25(docs, "text", Seq("join", "hash"))
      .select("doc_id", "bm25")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("d1") > scored("d3"), scored.toString)
    assert(scored("d3") > scored("d2"), "shorter doc with same tf must score higher")
    assert(scored("d4") == 0.0)
    // output keeps the input columns + bm25 only
    val cols = TextAnalysis.bm25(docs, "text", Seq("join")).columns.toSeq
    assert(cols == Seq("doc_id", "text", "bm25"))
  }

  test("bm25 propagates NULL text and rejects output-name collisions") {
    val docs = Seq(("d1", "join hash join"), ("d2", null))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.bm25(docs, "text", Seq("join"))
      .select("doc_id", "bm25").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows("d2").isEmpty, "null text must yield null score")
    assert(rows("d1").exists(_ > 0.0))
    // a caller column named like the output (any case) fails fast
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs.withColumnRenamed("doc_id", "BM25"), "text", Seq("join"))
    }
  }

  test("no-evidence text maps to und") {
    val pred = Seq(("t1", "qqqq wwww zzzz 12345")).toDF("id", "text")
      .select(TextAnalysis.langIdLabel(col("text"))).head.getString(0)
    assert(pred == "und")
  }

  test("chunk covers every token with the declared overlap; short docs are one chunk") {
    val text = (1 to 37).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "tiny doc")).toDF("doc_id", "text")
    val r = TextAnalysis.chunk(df, "text", chunkTokens = 10, overlap = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(x => (x.getLong(0), x.getInt(2), x.getString(3), x.getLong(4)))
    val doc1 = r.filter(_._1 == 1L)
    // stride 7: chunks start at tokens 1,8,15,22,29,36 -> ceil((37-10)/7)+1 = 5? (37-10+6)/7+1 = 33/7+1 = 4+1 = 5
    assert(doc1.length == 5)
    assert(doc1.head._3.startsWith("w1 ") && doc1.head._4 == 10L)
    // consecutive chunks overlap by exactly 3 tokens
    val toks = doc1.map(_._3.split(" ").toSeq).toSeq
    toks.sliding(2).foreach { w => assert(w(0).takeRight(3) == w(1).take(3)) }
    // final chunk truncated: starts at token 29, covers 29..37 = 9 tokens
    assert(doc1.last._4 == 9L && doc1.last._3.endsWith("w37"))
    // every token appears in order across chunks (stride-deduped coverage)
    val covered = toks.head ++ toks.tail.flatMap(_.drop(3))
    assert(covered == text.split(" ").toSeq)
    assert(r.filter(_._1 == 2L).toSeq == Seq((2L, 0, "tiny doc", 2L)))
  }

  test("bigram LM training: top-V vocab, unk mass, unk-mapped bigram counts") {
    val corpus = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(corpus, "text", vocabSize = 2)
    // unigrams a:3 b:1 c:1; top-2 by (count desc, word asc) -> a, b; c is unk
    assert(lm.vocab == Map("a" -> 3L, "b" -> 1L))
    assert(lm.unkCount == 1L)
    val U = TextAnalysis.UnkToken
    assert(lm.bigrams == Map("a b" -> 1L, "b a" -> 1L, s"a $U" -> 1L))
  }

  test("bigram LM maxBigrams cap engages: top-M by (count desc, bg asc) kept") {
    // 9 distinct bigrams (x1 y1 .. x9 y9) with counts 1..9, plus
    // "a a" seen 20 times — well over the cap of 3
    val rows = (1 to 9).flatMap(i => Seq.fill(i)((i.toLong, s"x$i y$i"))) ++
      Seq.fill(20)((99L, "a a"))
    val corpus = rows.toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(corpus, "text", vocabSize = 100,
      maxBigrams = 3)
    assert(lm.bigrams == Map("a a" -> 20L, "x9 y9" -> 9L, "x8 y8" -> 8L))
    // uncapped default keeps all 10
    val full = TextAnalysis.trainBigramLm(corpus, "text", vocabSize = 100)
    assert(full.bigrams.size == 10)
  }

  test("bigram perplexity matches hand-computed add-one smoothing") {
    val corpus = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(corpus, "text", vocabSize = 2)
    val r = TextAnalysis.bigramPerplexity(corpus, "text", lm)
      .orderBy("doc_id")
      .select("n_bigrams", "avg_logp", "ppl").collect()
    // doc 1: p(b|a)=(1+1)/(3+3)=1/3, p(a|b)=(1+1)/(1+3)=1/2
    //   avg = -ln(6)/2, ppl = sqrt(6)
    assert(r(0).getLong(0) == 2L)
    assert(r(0).getDouble(1) == math.rint(-math.log(6.0) / 2 * 1e6) / 1e6)
    assert(r(0).getDouble(2) == math.rint(math.sqrt(6.0) * 1e4) / 1e4)
    // doc 2: p(unk|a)=(1+1)/(3+3)=1/3 -> ppl 3
    assert(r(1).getLong(0) == 1L)
    assert(r(1).getDouble(2) == 3.0)
  }

  test("bigram perplexity edge cases: single token, unseen bigram") {
    val corpus = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(corpus, "text", vocabSize = 2)
    val r = TextAnalysis.bigramPerplexity(
        Seq((1L, "solo"), (2L, "b b")).toDF("doc_id", "text"), "text", lm)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 0L && r(0).isNullAt(3) && r(0).isNullAt(4))
    // "b b": unseen pair -> (0+1)/(1+3) = 1/4 -> ppl 4
    assert(r(1).getLong(2) == 1L && r(1).getDouble(4) == 4.0)
  }

  test("stupid-backoff trigram scoring engages all three levels as derived by hand") {
    // training: one doc "a b c a b d" -> N=6, V=4 (a:2 b:2 c:1 d:1),
    // bigrams {a b:2, b c:1, c a:1, b d:1}, trigrams each count 1
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBackoffLm(train, "text", vocabSize = 4)
    assert(lm.vocab == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    assert(lm.total == 6L && lm.unkCount == 0L)
    assert(lm.bigrams == Map("a b" -> 2L, "b c" -> 1L, "c a" -> 1L, "b d" -> 1L))
    assert(lm.trigrams.keySet ==
      Set("a b c", "b c a", "c a b", "a b d") && lm.trigrams.values.forall(_ == 1L))
    val score = Seq((1L, "a b c"),   // seen trigram: ln(1/2)
                    (2L, "x a b c"), // (U,a,b) backs off to 0.4*C(a b)/C(a): ln(0.4*2/2); then ln(1/2)
                    (3L, "d d d"),   // both unseen -> floor ln(0.16*(1+1)/(6+4+1))
                    (4L, "a b"),     // too short: 0 trigrams, null score
                    (5L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.backoffPerplexity(score, "text", lm)
      .orderBy("doc_id").select("n_trigrams", "avg_logp", "ppl").collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r(0).getLong(0) == 1L && r(0).getDouble(1) == r6(math.log(1.0 / 2.0)))
    assert(r(1).getLong(0) == 2L &&
      r(1).getDouble(1) == r6((math.log(0.4 * (2.0 / 2.0)) + math.log(1.0 / 2.0)) / 2.0))
    assert(r(2).getLong(0) == 1L &&
      r(2).getDouble(1) == r6(math.log(0.16 * ((1.0 + 1.0) / (6.0 + 4.0 + 1.0)))))
    assert(r(3).getLong(0) == 0L && r(3).isNullAt(1) && r(3).isNullAt(2))
    assert(r(4).getLong(0) == 0L && r(4).isNullAt(1))
  }

  test("backoff LM maxNgrams cap: a trigram with a pruned prefix bigram backs off") {
    // 3 decoy pairs seen 10x each dominate the bigram cut; "q r s" (5x)
    // keeps its trigram (only one in the table) but loses BOTH its
    // bigrams to the cap, so scoring it must fall through to the
    // unigram floor — the documented count-pruning trade.
    val rows = (1 to 3).flatMap(i => Seq.fill(10)((i.toLong, s"x$i y$i"))) ++
      Seq.fill(5)((99L, "q r s"))
    val corpus = rows.toDF("doc_id", "text")
    val lm = TextAnalysis.trainBackoffLm(corpus, "text", vocabSize = 100,
      maxNgrams = 3)
    assert(lm.bigrams.keySet == Set("x1 y1", "x2 y2", "x3 y3"))
    assert(lm.trigrams == Map("q r s" -> 5L))
    val r = TextAnalysis.backoffPerplexity(
        Seq((1L, "q r s")).toDF("doc_id", "text"), "text", lm)
      .select("avg_logp").head()
    // N = 3*2*10 + 5*3 = 75, V = 9, C(s) = 5
    val floor = math.log(0.16 * ((5.0 + 1.0) / (75.0 + 9.0 + 1.0)))
    assert(r.getDouble(0) == math.rint(floor * 1e6) / 1e6)
  }

  test("backoff LM training is partitioning-invariant") {
    val corpus = (1 to 40).map(i =>
      (i.toLong, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7}")).toDF("doc_id", "text")
    val one = TextAnalysis.trainBackoffLm(corpus.coalesce(1), "text", vocabSize = 5)
    val many = TextAnalysis.trainBackoffLm(corpus.repartition(13), "text", vocabSize = 5)
    assert(one == many)
  }

  test("dsirResample upweights the target domain and selects exactly N") {
    // corpus: 30 "english" docs + 10 "target" docs with a distinct
    // vocabulary; target = the distinct-vocab docs. DSIR must rank
    // every target doc above every background doc and select N=12:
    // all 10 target docs + 2 background by the doc_id tiebreak.
    val docs = (0 until 30).map(i =>
        (i.toLong, "the cat sat on the mat and looked fine", false)) ++
      (30 until 40).map(i =>
        (i.toLong, "le chien dort dans la maison verte", true))
    val df = docs.toDF("doc_id", "text", "is_fr")
    val r = TextAnalysis.dsirResample(df, "text", col("is_fr"),
      vocabSize = 16, nSelect = 12).orderBy("doc_id").collect()
    assert(r.length == 40)
    val w = r.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val minTarget = (30L until 40L).map(w).min
    val maxBg = (0L until 30L).map(w).max
    assert(minTarget > maxBg, s"target $minTarget !> background $maxBg")
    val sel = r.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(sel.size == 12)
    assert((30L until 40L).forall(sel)) // every target doc survives
    // identical docs tie -> lowest doc_ids win the remaining 2 slots
    assert(sel.contains(0L) && sel.contains(1L) && !sel.contains(2L))
    // n_feats = tokens + bigrams (9 + 8 for the background docs)
    assert(r(0).getLong(1) == 17L)
  }

  test("dsir model artifact roundtrip preserves every table and the scores") {
    import java.nio.file.Files
    val df = Seq((1L, "le chien dort", true), (2L, "the cat sat on it", false),
      (3L, "le chat sat", true)).toDF("doc_id", "text", "t")
    val m = TextAnalysis.trainDsirModel(df, "text", col("t"), vocabSize = 8)
    val path = Files.createTempDirectory("dsir_artifact").toString + "/model"
    TextAnalysis.writeDsirModel(spark, path, m)
    val loaded = TextAnalysis.loadDsirModel(spark, path)
    assert(loaded == m) // case-class equality: all four tables bit-equal
    val a = TextAnalysis.dsirScore(df, "text", m)
      .select("doc_id", "dsir_logw").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = TextAnalysis.dsirScore(df, "text", loaded)
      .select("doc_id", "dsir_logw").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("dsirResample selects everything when nSelect exceeds the corpus") {
    val df = Seq((1L, "a b c", true), (2L, "d e f", false))
      .toDF("doc_id", "text", "t")
    val r = TextAnalysis.dsirResample(df, "text", col("t"),
      vocabSize = 8, nSelect = 10).collect()
    assert(r.forall(_.getBoolean(3)))
  }

  test("tagKeywords: word-sequence semantics, mixed widths, normalization, empties") {
    val df = Seq(
      (1L, "Alpha  BETA gamma"),      // case + double space -> normalized hit
      (2L, "alphabet a gamma"),       // 'alpha' inside a word must NOT fire
      (3L, "x beta gamma y"),         // 2-gram phrase hit
      (4L, "beta"),                   // sub-phrase only: no 2-gram hit
      (5L, "")                        // empty text -> empty tags
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.tagKeywords(df, "text",
        Seq(("a", "alpha"), ("bg", "beta gamma"), ("g", "gamma")))
      .orderBy("doc_id").select("tags").as[String].collect().toSeq
    assert(got === Seq("a,bg,g", "g", "bg,g", "", ""))
    // duplicate phrases for one tag and repeated hits stay one tag
    val dup = graft.operators.TextAnalysis.tagKeywords(
        Seq((1L, "beta gamma beta gamma")).toDF("doc_id", "text"), "text",
        Seq(("bg", "beta gamma"), ("bg", "gamma beta")))
      .select("tags").as[String].collect().head
    assert(dup === "bg")
  }

  test("quantizeInt8 codes stay in [-127,127] and reconstruct within scale/2") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero vector
    ).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.quantizeInt8(df, "embedding")
      .orderBy("vec_id").collect()
    val q1 = r(0).getSeq[Int](2)
    assert(q1 == Seq(64, -127, 32, 0)) // scale = 1/127; 0.5/scale = 63.5 -> 64 (half-up)
    assert(r(0).getDouble(4) <= (1.0 / 127.0) / 2 + 1e-9)
    assert(r(1).getSeq[Int](2) == Seq(0, 0, 0, 0))
    assert(r(1).getDouble(3) == 0.0 && r(1).getDouble(4) == 0.0)
  }
}

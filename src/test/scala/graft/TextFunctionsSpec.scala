package graft

import graft.functions.{PiiFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** Clean-rule truth table (reference: src/llm_data_pipeline/clean/
  * rules.py:84-113) and PII regex cases (reference: src/llm_data_pipeline/
  * pii/run.py:37-67). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def reason(text: String, t: TextFunctions.CleanThresholds): String =
    Seq(text).toDF("t").select(TextFunctions.judgeReason(col("t"), t)).head().getString(0)

  private val t = TextFunctions.CleanThresholds(
    minChars = 10, maxChars = 100, minNonWs = 0.6, minAlphaCjk = 0.4,
    maxPunct = 0.3, maxDupLine = 0.3)

  test("judge order: too_short fires first") {
    assert(reason("short", t) == "too_short")
  }
  test("too_long") {
    assert(reason("a" * 101, t) == "too_long")
  }
  test("too_sparse: mostly whitespace") {
    assert(reason("a b c d e f g h i j " + " " * 40, t) == "too_sparse")
  }
  test("low_language_signal: digits") {
    assert(reason("1234567890 1234567890 123", t) == "low_language_signal")
  }
  test("too_much_punct") {
    assert(reason("abcdefghij!!!!!!!!!", t) == "too_much_punct")
  }
  test("dup_lines") {
    val txt = Seq("same line", "same line", "same line", "other one", "same line").mkString("\n")
    assert(reason(txt, t) == "dup_lines")
  }
  test("ok text passes") {
    assert(reason("this is a perfectly reasonable sentence", t) == "ok")
  }
  test("dup-line ratio needs >=5 lines") {
    val txt = Seq("x y", "x y", "x y").mkString("\n") // 3 lines, all dup
    val r = Seq(txt).toDF("t").select(TextFunctions.dupLineRatio(col("t"))).head().getDouble(0)
    assert(r == 0.0)
  }

  test("newline normalize collapses CRLF and 3+ blank lines") {
    val got = Seq("a\r\nb\r c\n\n\n\nd").toDF("t")
      .select(TextFunctions.normalizeNewlines(col("t"))).head().getString(0)
    assert(got == "a\nb\n c\n\nd")
  }

  test("token count") {
    val got = Seq("  the quick   brown\tfox ").toDF("t")
      .select(TextFunctions.tokenCount(col("t"))).head().getInt(0)
    assert(got == 4)
  }

  test("pii redaction replaces all five classes") {
    val txt = "mail a.b+c@mail.example.org host 192.168.1.254 v6 2001:db8:0:1:1:1:1:1 " +
      "ssn 123-45-6789 tel +1 (415) 555-0134 end"
    val got = Seq(txt).toDF("t").select(PiiFunctions.redact(col("t"))).head().getString(0)
    assert(got.contains("<EMAIL>"), got)
    assert(got.contains("<IP>"), got)
    assert(got.contains("<SSN>"), got)
    assert(got.contains("<PHONE>"), got)
    assert(!got.contains("@"), got)
    assert(!got.contains("123-45"), got)
  }

  test("pii flags are independent signals") {
    val row = Seq("only an email: x@y.co").toDF("t")
      .select(PiiFunctions.hasEmail(col("t")), PiiFunctions.hasIpv4(col("t")),
        PiiFunctions.hasSsn(col("t")), PiiFunctions.hasPhone(col("t"))).head()
    assert(row.getBoolean(0) && !row.getBoolean(1) && !row.getBoolean(2) && !row.getBoolean(3))
  }

  test("ipv4 octet bounds: 256 not matched, 255 matched") {
    val r = Seq("a 1.2.3.256 b", "c 255.255.255.255 d").toDF("t")
      .select(PiiFunctions.hasIpv4(col("t"))).collect().map(_.getBoolean(0))
    assert(r.toSeq == Seq(false, true))
  }

  test("mojibake repair fixes classic double-encoding and roundtrips") {
    val clean = "café “quote” naïve ’s – dash … 5°"
    // real-world garble: UTF-8 bytes of the clean string, decoded cp1252
    val garbled = new String(
      clean.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))
    val repaired = Seq(garbled).toDF("t")
      .select(TextFunctions.fixMojibake(col("t"))).head().getString(0)
    // ” (0x9D tail, undefined in cp1252) is deliberately out of scope;
    // every other char must come back exactly
    assert(repaired.startsWith("café “quote"), repaired)
    assert(repaired.contains("’s – dash … 5°"), repaired)
    // full roundtrip over the supported table
    val all = TextFunctions.MojibakeTable.map(_._2).mkString(" ")
    val rt = Seq(all).toDF("t")
      .select(TextFunctions.fixMojibake(
        graft.functions.TextFunctions.corruptMojibake(col("t")))).head().getString(0)
    assert(rt == all)
  }

  test("mojibake repair leaves clean ascii and cjk text untouched") {
    val texts = Seq("plain ascii text!", "你好世界 中文 文本")
    val out = texts.toDF("t")
      .select(TextFunctions.fixMojibake(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == texts)
  }

  test("html extraction strips structure and decodes entities") {
    val html = "<html><head><title>T</title><script>if (a < b) { x(); }</script>" +
      "<style>p { color: red; }</style></head><body>" +
      "<h1>Head</h1><!-- secret --><p>one &amp; two &lt;tag&gt; &amp;lt;kept&amp;gt;</p>" +
      "<ul><li>a</li><li>b</li></ul><p>after<br>break</p></body></html>"
    val got = Seq(html).toDF("t")
      .select(TextFunctions.htmlToText(col("t"))).head().getString(0)
    assert(got == "THead\none & two <tag> &lt;kept&gt;\na\nb\nafter\nbreak", got)
    assert(!got.contains("secret") && !got.contains("color") && !got.contains("x()"))
  }

  test("html extraction collapses whitespace and blank-line runs") {
    val html = "<div><p>a   b</p>\n\n\n\n<p>c\t d</p></div>"
    val got = Seq(html).toDF("t")
      .select(TextFunctions.htmlToText(col("t"))).head().getString(0)
    assert(got == "a b\n\nc d", got)
  }

  test("luhn checksum accepts valid cards and rejects a transposed digit") {
    // 4539148803436467 is a standard Luhn-valid test number
    val r = Seq(
      "4539148803436467",        // valid, bare
      "4539 1488 0343 6467",     // valid, spaced
      "4539-1488-0343-6467",     // valid, dashed
      "4539148803436476",        // last two digits transposed -> invalid
      "",                        // no digits -> false
      "79927398713"              // classic Luhn example, valid
    ).toDF("t").select(PiiFunctions.luhnValid(col("t"))).collect().map(_.getBoolean(0))
    assert(r.toSeq == Seq(true, true, true, false, false, true))
  }

  test("card extraction and redaction") {
    val txt = "pay with 4539 1488 0343 6467 or call me"
    val row = Seq(txt).toDF("t").select(
      PiiFunctions.firstCardDigits(col("t")),
      PiiFunctions.redactCards(col("t"))).head()
    assert(row.getString(0) == "4539148803436467")
    assert(row.getString(1) == "pay with <CARD> or call me")
    val none = Seq("no digits here").toDF("t")
      .select(PiiFunctions.firstCardDigits(col("t"))).head().getString(0)
    assert(none == "")
  }

  test("lang normalize falls back to cjk heuristic") {
    val df = Seq(("EN-us", "hello"), (null, "hello"), (null, "你好世界")).toDF("lang", "text")
    val got = df.select(PiiFunctions.normalizeLang(col("lang"), col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "en", "zh"))
  }

  test("nfkc normalization composes full-width and ligature forms") {
    import graft.functions.HashFunctions
    val got = Seq("\uFF28\uFF45\uFF4C\uFF4C\uFF4F \uFB01nal \u2460").toDF("t")
      .select(HashFunctions.normalizeNfkc(col("t"))).head().getString(0)
    assert(got == "Hello final 1", got)
  }

  test("word shingles") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 2)).head().getSeq[String](0)
    assert(got == Seq("a b", "b c", "c d"))
  }

  test("deflateRatio orders repetitive < prose < random; total on empties") {
    import graft.functions.HashFunctions
    val rep = "spam ham " * 200
    val prose = (1 to 60).map(i =>
      s"sentence $i carries slightly varied content tokens n$i").mkString(" ")
    val rand = new scala.util.Random(7)
    val noise = Array.fill(1600)((rand.nextInt(94) + 33).toChar).mkString
    val r = Seq((1L, rep), (2L, prose), (3L, noise), (4L, ""), (5L, null))
      .toDF("id", "t")
      .select(col("id"), HashFunctions.deflateRatio(col("t")).as("r"))
      .orderBy("id").collect()
    val (rr, rp, rn) = (r(0).getDouble(1), r(1).getDouble(1), r(2).getDouble(1))
    assert(rr < rp && rp < rn, s"want repetitive < prose < random, got $rr $rp $rn")
    assert(rr < 0.1 && rn > 0.7)
    assert(r(3).getDouble(1) === 1.0)  // empty: defined, incompressible
    assert(r(4).isNullAt(1))           // null in, null out
    // deterministic across invocations (pinned oracles rely on it)
    val again = Seq((1L, rep)).toDF("id", "t")
      .select(HashFunctions.deflateRatio(col("t"))).head().getDouble(0)
    assert(again === rr)
  }

  test("splitWsRuns is bit-equivalent to split(\"\\\\s+\") minus empties") {
    // atoms keep surrogate pairs intact; the set mixes every member of
    // Java regex's \s class with unicode whitespace that is NOT in it
    // (NBSP, LINE SEP, ideographic space, FS/US) and must stay glued
    val atoms = Seq(" ", "\t", "\n", "\u000B", "\f", "\r",
      "\u00A0", "\u2028", "\u3000", "\u001C", "\u001F",
      "a", "b", "z", "\u00e9", new String(Character.toChars(0x1F642)), "\u2581")
    val fixed = Seq("", " ", "\t\n\u000B\f\r ", "one", " lead", "trail ",
      "a  b\tc\nd\u000Be\ff\rg", "nbsp\u00A0stays one token",
      "line\u2028sep and\u3000ideographic stay glued",
      "  many   runs  \t\t mixed \r\n ends  ")
    val rnd = new scala.util.Random(42)
    val randoms = (1 to 300).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
    }
    (fixed ++ randoms).foreach { s =>
      val ref = s.split("\\s+").toSeq.filter(_.nonEmpty)
      assert(TextFunctions.splitWsRuns(s).toSeq == ref,
        s"splitWsRuns drift on ${s.map(c => f"\\u${c.toInt}%04X").mkString}")
    }
  }

}

package graft

import graft.functions.{PiiFunctions, UrlFunctions}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** URL canonicalization (d67) and stable pseudonymization (p05)
  * properties, plus MMR candidate-exhaustion. */
class UrlPiiOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlFunctions.canonicalize(col("u"))).as[String].head()

  test("canonicalize strips tracking params, sorts survivors, folds case") {
    assert(canon("https://EX.com/a/b/?b=2&utm_source=x&a=1&fbclid=z#frag")
      === "https://ex.com/a/b?a=1&b=2")
  }

  test("canonicalize keeps ports, normalizes root path, leaves clean URLs") {
    assert(canon("https://ex.com:8080/") === "https://ex.com:8080/")
    assert(canon("https://ex.com:8080") === "https://ex.com:8080/")
    assert(canon("https://ex.com/p?q=1") === "https://ex.com/p?q=1")
    // ref= is tracking; a param merely CONTAINING ref survives
    assert(canon("https://ex.com/p?ref=x&pref=1") === "https://ex.com/p?pref=1")
  }

  test("canonicalize: uppercase scheme folds, scheme-less passes through") {
    assert(canon("HTTP://EX.com/A/?utm_source=x") === "http://ex.com/A")
    // no scheme -> unchanged (never collapse unparseable URLs to one key)
    assert(canon("example.com/a?b=1") === "example.com/a?b=1")
    assert(canon("") === "")
    assert(canon("not a url") === "not a url")
  }

  test("pseudonymizeEmail is stable, collision-separating, and email-free") {
    val rows = Seq("mail a@x.com now", "also a@x.com here", "b@y.org wrote", "no email")
    val out = rows.toDF("t")
      .select(PiiFunctions.pseudonymizeEmail(col("t")).as("p")).as[String].collect()
    val tok = "user_[0-9a-f]{8}".r
    val t0 = tok.findFirstIn(out(0)).get
    val t1 = tok.findFirstIn(out(1)).get
    val t2 = tok.findFirstIn(out(2)).get
    assert(t0 === t1, "same email, same pseudonym")
    assert(t0 !== t2, "different emails, different pseudonyms")
    assert(!out.exists(_.contains("@")), "no email survives")
    assert(out(3) === "no email", "rows without email pass through")
  }

  test("pseudonymizeEmail rewrites each match with its own token") {
    val out = Seq("a@x.com wrote to b@y.org and a@x.com")
      .toDF("t").select(PiiFunctions.pseudonymizeEmail(col("t")).as("p"))
      .as[String].head()
    val toks = "user_[0-9a-f]{8}".r.findAllIn(out).toSeq
    assert(toks.size === 3, s"three matches rewritten: $out")
    assert(toks(0) === toks(2), "same email, same pseudonym")
    assert(toks(0) !== toks(1), "different emails, different pseudonyms")
    assert(!out.contains("@"))
    assert(out.startsWith(toks(0) + " wrote to "))
  }

  test("mmrRerank stops when candidates are exhausted") {
    val df = (0L to 3L).map(i => (i, Seq(1f, 0.1f * i, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(df.filter(col("vec_id") === 0), df,
        "vec_id", "vec_id", "embedding", kCand = 3, kOut = 5)
      .select("mmr_rank").as[Int].collect().sorted
    assert(out === Array(1, 2, 3))
  }
}

package graft

import graft.operators.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the r13 one-pass span-fingerprint expression
  * (functions.SpanWindowFps) bit-identical to the
  * `unhex(md5(array_join(slice(tokens, i+1, window), " ")))` HOF chain
  * it replaced — the fingerprints feed every span-dedup candidate set
  * (x15/d80/d81/st26/st31/st07, decontamination spans), so a single
  * byte of drift moves excision decisions. */
class SpanFpSpec extends SparkSpec {
  import spark.implicits._

  /** The exact r12 formulation (copied, not referenced — the point is
    * to pin against the OLD shape). */
  private def oldChain(text: Column, window: Int): Column = {
    val tk = split(regexp_replace(trim(coalesce(text, lit(""))), "\\s+", " "), " ")
    element_at(transform(array(tk), a =>
      when(size(a) >= window,
        transform(sequence(lit(0), size(a) - window),
          i => unhex(md5(array_join(slice(a, i + 1, lit(window)), " ")))))
        .otherwise(array().cast("array<binary>"))), 1)
  }

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h i j k l m",
    "exactly eight tokens here to fill window", // 7 tokens: sub-window at 8
    "one",
    "",
    null,
    "   padded    with   irregular   whitespace   runs   everywhere okay",
    "dup dup dup dup dup dup dup dup dup dup",
    "unicode töken café 日本語 mixed in the stream okay fine",
    "tab\tand\nnewline separated tokens also normalize the same way here"
  )

  test("SpanWindowFps == unhex(md5(array_join(slice(...)))) on every doc") {
    for (w <- Seq(1, 2, 3, 8)) {
      val df = docs.toDF("text")
        .select(Dedup.spanFingerprints(col("text"), w).as("nu"),
          oldChain(col("text"), w).as("old"))
      val rows = df.collect()
      rows.foreach { r =>
        val nu = r.getSeq[Array[Byte]](0).map(_.toSeq)
        val old = r.getSeq[Array[Byte]](1).map(_.toSeq)
        assert(nu == old, s"window=$w")
      }
    }
  }

  test("SpanWindowFps: known md5 value and window coverage") {
    val fps = Seq("a b c").toDF("text")
      .select(Dedup.spanFingerprints(col("text"), 2).as("f"))
      .collect()(0).getSeq[Array[Byte]](0)
    // two windows: "a b", "b c" — digests match MessageDigest directly
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(fps.map(_.toSeq) == Seq(
      md.digest("a b".getBytes("UTF-8")).toSeq,
      md.digest("b c".getBytes("UTF-8")).toSeq))
  }

  test("SpanWindowFps survives a groupBy key position (shuffle-safe binary)") {
    // fingerprints are shuffle keys in spanTrim — binary equality must
    // group identically windowed text from different docs
    val df = Seq((1L, "x y z w"), (2L, "p q x y z w")).toDF("id", "t")
      .select(col("id"), explode(Dedup.spanFingerprints(col("t"), 3)).as("fp"))
    val dupFps = df.groupBy("fp").count().where(col("count") >= 2).count()
    // "x y z" and "y z w" appear in both docs
    assert(dupFps == 2L)
  }
}

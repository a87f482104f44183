package graft

import graft.functions.TextFunctions
import graft.operators.{MergeUpsert, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 corpus-curation battery: C4 page rules, MERGE snapshot
  * maintenance, centroid assignment. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- C4 line/page rules ----------------

  test("c4KeptLines keeps only terminal-punct lines with >= minWords words") {
    val lines = Seq(
      "one two three.",    // kept
      "one two three",     // no terminal punct
      "one two.",          // 2 words
      "ends with bang!",   // kept
      "ends with quote\"", // kept
      "q mark here?",      // kept
      "   .",              // punct but 1 token
      "")                  // empty
    val out = Seq(lines).toDF("ls")
      .select(TextFunctions.c4KeptLines(array(lines.map(lit): _*)).as("kept"))
      .as[Seq[String]].head()
    assert(out === Seq("one two three.", "ends with bang!",
      "ends with quote\"", "q mark here?"))
  }

  test("c4DocFlags flags brace and lorem pages independently") {
    def flags(ls: Seq[String]): (Boolean, Boolean) = {
      val r = Seq(1).toDF("x")
        .select(TextFunctions.c4DocFlags(array(ls.map(lit): _*)).as("f"))
        .select("f.has_brace", "f.has_lorem").head()
      (r.getBoolean(0), r.getBoolean(1))
    }
    assert(flags(Seq("clean line.", "another.")) === ((false, false)))
    assert(flags(Seq("code { here", "fine.")) === ((true, false)))
    assert(flags(Seq("some Lorem Ipsum boilerplate.")) === ((false, true)))
    assert(flags(Seq("x {", "lorem ipsum")) === ((true, true)))
  }

  test("c4BadwordKeep drops any-match pages case-insensitively, keeps null/empty") {
    def keep(t: Option[String], bw: Seq[String] = Seq("bad", "worse")): Boolean =
      Seq(Tuple1(t)).toDF("text")
        .select(TextFunctions.c4BadwordKeep(col("text"), bw).as("k"))
        .head().getBoolean(0)
    assert(keep(Some("all clean words here")))
    assert(!keep(Some("one bad word")))
    assert(!keep(Some("shouting WORSE still matches")))  // case-folded
    assert(keep(Some("badge isn't bad")) === false)      // exact token 'bad' present
    assert(keep(Some("badge alone is fine")))            // substring does NOT match
    assert(keep(Some("  spaced\t\ttokens   ok  ")))      // whitespace flattening
    assert(keep(None))                                   // null text keeps
    assert(keep(Some("")))                               // empty keeps
    assert(keep(Some("MiXeD BaD"), Seq("BAD")) === false) // list case-folded too
  }

  // ---------------- MERGE upsert ----------------

  private def baseDf = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
  ).toDF("k", "txt", "n")

  test("applyChanges: update, insert, delete, keep, and delete-of-missing") {
    val changes = Seq(
      (2L, Some("b2"), Some(21L), "U"),  // update
      (3L, None, None, "D"),             // delete
      (9L, Some("i"), Some(90L), "U"),   // insert
      (8L, None, None, "D")              // delete of missing key: no-op
    ).toDF("k", "txt", "n", "op")
    val out = MergeUpsert.applyChanges(baseDf, changes, "k", Seq("txt", "n"))
      .orderBy("k").collect().toSeq
    assert(out === Seq(
      Row(1L, "a", 10L, "keep"),
      Row(2L, "b2", 21L, "update"),
      Row(4L, "d", 40L, "keep"),
      Row(9L, "i", 90L, "insert")))
  }

  test("applyChanges: null payload on an upsert keeps the base value (partial update)") {
    val changes = Seq((1L, Option.empty[String], Some(11L), "U"))
      .toDF("k", "txt", "n", "op")
    val out = MergeUpsert.applyChanges(baseDf, changes, "k", Seq("txt", "n"))
      .where($"k" === 1L).head()
    assert(out === Row(1L, "a", 11L, "update"))
  }

  test("applyChanges: unknown op fails loudly") {
    val changes = Seq((1L, Some("x"), Some(1L), "Z")).toDF("k", "txt", "n", "op")
    val ex = intercept[Exception] {
      MergeUpsert.applyChanges(baseDf, changes, "k", Seq("txt", "n")).collect()
    }
    assert(ex.getMessage.contains("unknown op") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown op")))
  }

  test("diff classifies I/U/D, skips unchanged, and round-trips through applyChanges") {
    val next = Seq(
      (1L, "a", 10L),   // unchanged -> absent from diff
      (2L, "b2", 20L),  // payload changed -> U
      (9L, "i", 90L)    // new key -> I; keys 3,4 gone -> D
    ).toDF("k", "txt", "n")
    val d = MergeUpsert.diff(baseDf, next, "k", Seq("txt", "n"))
      .orderBy("k").collect().toSeq
    assert(d === Seq(
      Row(2L, "U", "b2", 20L),
      Row(3L, "D", null, null),
      Row(4L, "D", null, null),
      Row(9L, "I", "i", 90L)))

    // round-trip law: applying the diff as a change log reproduces next
    val asChanges = MergeUpsert.diff(baseDf, next, "k", Seq("txt", "n"))
      .withColumn("op", when($"change" === "D", "D").otherwise("U"))
      .select("k", "txt", "n", "op")
    val rebuilt = MergeUpsert.applyChanges(baseDf, asChanges, "k", Seq("txt", "n"))
      .select("k", "txt", "n").orderBy("k").collect().toSeq
    assert(rebuilt === next.orderBy("k").collect().toSeq)
  }

  test("diff treats null payloads null-safely (null == null is unchanged)") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "txt")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "txt")
    val d = MergeUpsert.diff(o, n, "k", Seq("txt")).collect().toSeq
    assert(d === Seq(Row(2L, "U", null)))
  }

  // ---------------- centroid assignment ----------------

  test("centroidAssign matches the explode+rank argmax, ties to smaller centroid id") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 2.0f)),
      (2L, Seq(1.0f, 1.0f)),   // equidistant from both centroids -> cell 10
      (3L, Seq(-1.0f, -1.0f))) // equally BAD vs both -> still smaller id
      .toDF("id", "vec")
    val cents = Seq((10L, Seq(1.0f, 0.0f)), (20L, Seq(0.0f, 1.0f)))
      .toDF("centroid_id", "centv")

    val got = Similarity.centroidAssign(vecs, "id", "vec", cents)
      .orderBy("id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // brute-force reference: explode all (vec, centroid) pairs, rank
    val pairs = vecs.crossJoin(cents)
      .select($"id", $"centroid_id",
        Similarity.cosine(transform($"vec", _.cast("double")),
          transform($"centv", _.cast("double"))).as("s"))
    val w = Window.partitionBy("id").orderBy($"s".desc, $"centroid_id")
    val want = pairs.withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .orderBy("id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(got === want)
    assert(got.map(_._2) === Seq(10L, 20L, 10L, 10L)) // ties -> smaller cid
  }

  test("centroidAssign is a zero-shuffle projection (no Exchange in the plan)") {
    val vecs = Seq((0L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val cents = Seq((1L, Seq(1.0f, 0.0f))).toDF("centroid_id", "centv")
    val plan = Similarity.centroidAssign(vecs, "id", "vec", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}

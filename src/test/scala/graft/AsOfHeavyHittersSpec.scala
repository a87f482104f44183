package graft

import graft.operators.{AsOfJoin, HeavyHitters}
import org.apache.spark.sql.functions._

class AsOfHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("as-of backward join picks latest right row at or before left ts") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 60L, 6.0))
      .toDF("key", "qts", "price")
    val got = AsOfJoin.backward(trades, quotes, "key", "ts", "qts", Seq("price"))
      .orderBy("key", "ts").collect()
    // t1@100 -> quote@100 (equal ts matches); t2@205 -> quote@200; t3@50 -> none
    assert(got.map(r => (r.getString(2), Option(r.get(3)))).toSeq ==
      Seq(("t1", Some(10.0)), ("t2", Some(20.0)), ("t3", None)))
  }

  test("as-of join honors tolerance") {
    val l = Seq((1L, 1000L, "a")).toDF("key", "ts", "tag")
    val r = Seq((1L, 10L, 1.5)).toDF("key", "qts", "v")
    val near = AsOfJoin.backward(l, r, "key", "ts", "qts", Seq("v"), toleranceUs = 2000L).head()
    val far = AsOfJoin.backward(l, r, "key", "ts", "qts", Seq("v"), toleranceUs = 100L).head()
    assert(near.getDouble(3) == 1.5)
    assert(far.isNullAt(3))
  }

  test("as-of forward join picks earliest right row at or after left ts") {
    val clicks = Seq((1L, 100L, "c1"), (1L, 205L, "c2"), (2L, 50L, "c3"))
      .toDF("key", "ts", "click")
    val buys = Seq((1L, 100L, 10.0), (1L, 150L, 15.0), (1L, 90L, 9.0), (2L, 40L, 4.0))
      .toDF("key", "qts", "price")
    val got = AsOfJoin.forward(clicks, buys, "key", "ts", "qts", Seq("price"))
      .orderBy("key", "ts").collect()
    // c1@100 -> buy@100 (equal ts matches, not the earlier 90);
    // c2@205 -> nothing follows; c3@50 -> nothing at-or-after
    assert(got.map(r => (r.getString(2), Option(r.get(3)))).toSeq ==
      Seq(("c1", Some(10.0)), ("c2", None), ("c3", None)))
  }

  test("as-of forward honors tolerance and tie-breaks deterministically") {
    val l = Seq((1L, 10L, "a")).toDF("key", "ts", "tag")
    val r = Seq((1L, 1000L, 5.0), (1L, 1000L, 3.0)).toDF("key", "qts", "v")
    val near = AsOfJoin.forward(l, r, "key", "ts", "qts", Seq("v"), toleranceUs = 2000L).head()
    val far = AsOfJoin.forward(l, r, "key", "ts", "qts", Seq("v"), toleranceUs = 100L).head()
    assert(near.getDouble(3) == 3.0) // struct compare: smaller v wins the tie
    assert(far.isNullAt(3))
  }

  test("misra-gries finds all true heavy hitters with lower-bound counts") {
    val data = (Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2")
      ++ (1 to 400).map(i => s"tail$i")).map(Tuple1(_))
    val df = data.toDF("w").repartition(8)
    val hh = HeavyHitters.topK(df, "w", 10).collect()
    val byWord = hh.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byWord.contains("hot1") && byWord.contains("hot2"))
    assert(byWord("hot1") <= 500 && byWord("hot1") > 500 - 1200 / 10)
    val exact = HeavyHitters.topKExact(df, "w", 5).collect()
    assert(exact.head.getString(0) == "hot1" && exact.head.getLong(1) == 500)
    assert(exact(1).getString(0) == "hot2" && exact(1).getLong(1) == 300)
  }
}

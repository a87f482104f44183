package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join on skewed data") {
    // 10k rows all sharing one hot key + a tail of normal keys
    val left = ((1 to 10000).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "lv")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex.toDF("key", "rv")
    val plain = left.join(right, "key").agg(count(lit(1)), sum("lv"), sum("rv")).head()
    val salted = SkewJoin.saltedInnerJoin(left, right, "key", buckets = 8)
      .agg(count(lit(1)), sum("lv"), sum("rv")).head()
    assert(plain == salted)
  }

  test("salted collect_list preserves the multiset per key") {
    val df = ((1 to 500).map(i => ("hot", i)) ++ Seq(("cold", 1), ("cold", 2)))
      .toDF("key", "v")
    val got = SkewJoin.saltedCollectList(df, "key", "v", buckets = 4)
      .select(col("key"), size(col("v_list")).as("n"),
        aggregate(col("v_list"), lit(0L), (a, x) => a + x).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got("hot") == ((500, (1 to 500).map(_.toLong).sum)))
    assert(got("cold") == ((2, 3L)))
  }
}

package graft

import graft.tools.ExplainAudit
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The plan-sweep red-flag detector must fire on REAL formatted plans —
  * the rendering of an empty partition spec is position-based, so this
  * pins it against actual Spark output rather than an assumed token. */
class ExplainAuditSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("unpartitioned window is flagged; partitioned window is not") {
    val df = (1 to 50).map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "g", "v")
    val bad = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    assert(ExplainAudit.redFlags(planOf(bad)).contains("unpartitioned-window"),
      planOf(bad))
    val good = df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy(col("v"), col("id"))))
    assert(!ExplainAudit.redFlags(planOf(good)).contains("unpartitioned-window"),
      planOf(good))
  }

  test("unpartitioned top-k (WindowGroupLimit path) is flagged") {
    val df = (1 to 50).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
    val bad = df.withColumn("rn",
        row_number().over(Window.orderBy(desc("v"), asc("id"))))
      .filter(col("rn") <= 3)
    assert(ExplainAudit.redFlags(planOf(bad)).contains("unpartitioned-window"),
      planOf(bad))
  }

  test("cartesian product is flagged; broadcast nested loop is not") {
    val a = (1 to 10).map(i => (i.toLong, i)).toDF("ida", "va")
    val b = (1 to 10).map(i => (i.toLong, i)).toDF("idb", "vb")
    // tiny relations auto-broadcast; disable to force the cartesian plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cart = a.join(b, col("va") < col("vb"))
      assert(ExplainAudit.redFlags(planOf(cart)).contains("cartesian"), planOf(cart))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val bcast = a.join(broadcast(b), col("va") < col("vb"))
    assert(ExplainAudit.redFlags(planOf(bcast)).isEmpty, planOf(bcast))
  }

  test("partitioned-but-unordered window (count over stratum) is NOT flagged") {
    val df = (1 to 50).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val counted = df.withColumn("n",
      count(lit(1)).over(Window.partitionBy("g")))
    assert(ExplainAudit.redFlags(planOf(counted)).isEmpty, planOf(counted))
  }
}

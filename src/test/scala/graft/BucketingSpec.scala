package graft

import graft.core.Bucketing
import org.apache.spark.sql.functions._

/** Proof-level spec for the bucketed co-located join path: the plans
  * must contain ZERO shuffle Exchanges, and results must match the
  * plain (shuffled) join bit-for-bit. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withSmj[T](body: => T): T = {
    // force sort-merge join so the Exchange count is about bucketing,
    // not about a broadcast making the question moot
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("matching bucket specs join and aggregate with zero Exchange") {
    val orders = (1 to 400).map(i => (i.toLong % 97, s"o$i", i * 10.0))
      .toDF("cust_id", "order_id", "amount")
    val custs = (0 to 96).map(i => (i.toLong, s"cust$i")).toDF("cust_id", "name")
    Bucketing.writeBucketed(orders, "b_orders", "cust_id", 8)
    Bucketing.writeBucketed(custs, "b_custs", "cust_id", 8)
    try withSmj {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_custs", "cust_id")
      assert(Bucketing.shuffleExchanges(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      // same rows as the plain shuffled join of the raw frames
      val expected = orders.join(custs, Seq("cust_id"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == expected)

      // aggregation on the bucket key: no Exchange either
      val agg = spark.table("b_orders").groupBy("cust_id")
        .agg(sum("amount").as("total"))
      assert(Bucketing.shuffleExchanges(agg) == 0,
        agg.queryExecution.executedPlan.toString)
      val expAgg = orders.groupBy("cust_id").agg(sum("amount").as("total"))
        .collect().map(_.toSeq).toSet
      assert(agg.collect().map(_.toSeq).toSet == expAgg)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_custs")
    }
  }

  test("bucketed band index: incremental join shuffles only the new batch side") {
    // the continuous-ingest shape (Dedup.incrementalMinhash): corpus
    // band index written ONCE bucketed on (band_id, band_hash); each
    // arriving batch's bands then join it with a single Exchange — the
    // (small) new side — while the corpus-sized index is read in place.
    val idx = (0L until 1000L).map(i => (i % 32, i % 97, i))
      .toDF("band_id", "band_hash", "id")
    Bucketing.writeBucketedMulti(idx, "b_bandidx", Seq("band_id", "band_hash"), 8)
    try withSmj {
      val newBands = (0L until 100L).map(i => (i % 32, i % 97, 10000 + i))
        .toDF("band_id", "band_hash", "id")
      val joined = spark.table("b_bandidx").hint("merge")
        .join(newBands, Seq("band_id", "band_hash"))
      assert(Bucketing.shuffleExchanges(joined) == 1,
        joined.queryExecution.executedPlan.toString)
      // row-level sanity vs the plain shuffled join
      val expected = idx.join(newBands.withColumnRenamed("id", "nid"),
        Seq("band_id", "band_hash")).count()
      assert(joined.count() == expected)
    } finally Bucketing.dropTable(spark, "b_bandidx")
  }

  test("scannedPartitions proves pruning: filtered read touches one dir, full read all") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "a", "z"), (4L, "c", "w"))
      .toDF("id", "k", "v")
      .write.mode("overwrite").partitionBy("k").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("k") === "a")
    val (nP, pushedP) = Bucketing.scannedPartitions(pruned)
    assert(nP == 1 && pushedP)
    assert(pruned.count() == 2)
    val full = spark.read.parquet(dir)
    val (nF, pushedF) = Bucketing.scannedPartitions(full)
    assert(nF == 3 && !pushedF)
  }

  test("unbucketed baseline of the same join does shuffle") {
    val a = (1 to 100).map(i => (i.toLong, i)).toDF("k", "v")
    val b = (1 to 100).map(i => (i.toLong, i * 2)).toDF("k", "w")
    withSmj {
      val plain = a.join(b, Seq("k"))
      assert(Bucketing.shuffleExchanges(plain) > 0)
    }
  }
}

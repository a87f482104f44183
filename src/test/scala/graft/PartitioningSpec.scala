package graft

import graft.core.Partitioning
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("distributedPrefixSum matches the driver-side running sum, any partitioning") {
    // non-trivial order (desc key, asc tiebreak) + two value columns
    val rows = (1L to 300L).map(i => (i, i % 13, i % 5 + 1, i % 3))
    val ref = {
      var a = 0L; var b = 0L
      rows.sortBy { case (id, k, _, _) => (-k, id) }.map { case (id, _, v1, v2) =>
        a += v1; b += v2; (id, a, b)
      }.sortBy(_._1)
    }
    for (parts <- Seq(1, 4, 17)) {
      val got = Partitioning.distributedPrefixSum(
          rows.toDF("id", "k", "v1", "v2").repartition(parts),
          Seq(col("k").desc, col("id").asc),
          Seq("v1" -> "r1", "v2" -> "r2"), numParts = 5)
        .select("id", "r1", "r2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == ref, s"input partitions=$parts")
    }
    spark.catalog.clearCache()
  }

  test("distributedPrefixSum: single row and empty input") {
    val one = Partitioning.distributedPrefixSum(
      Seq((1L, 7L)).toDF("id", "v"), Seq(col("id").asc), Seq("v" -> "r"))
    assert(one.select("r").collect().map(_.getLong(0)).toSeq == Seq(7L))
    val empty = Partitioning.distributedPrefixSum(
      Seq.empty[(Long, Long)].toDF("id", "v"), Seq(col("id").asc), Seq("v" -> "r"))
    assert(empty.count() == 0)
    spark.catalog.clearCache()
  }
}

package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 100L).map(i => (i, if (i <= 80) "en" else "de")).toDF("id", "lang")

  test("stratified exact sample keeps ceil(frac*n) per stratum, reproducibly") {
    val s1 = Sampling.stratifiedExact(df, "lang", 0.25, "id")
    val counts = s1.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 20L, "de" -> 5L))
    val s2 = Sampling.stratifiedExact(df.repartition(7), "lang", 0.25, "id")
    assert(s1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select("id").collect().map(_.getLong(0)).sorted.toSeq) // partition-invariant
  }

  test("cap per stratum bounds group sizes") {
    val capped = Sampling.capPerStratum(df, "lang", 10, "id")
    assert(capped.groupBy("lang").count().collect().forall(_.getLong(1) <= 10))
    assert(capped.count() == 20)
  }

  test("weighted mixture applies per-stratum fractions") {
    val mixed = Sampling.mixture(df, "lang", Map("en" -> 0.1), defaultFrac = 0.5, "id")
    val counts = mixed.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 8L, "de" -> 10L))
  }

  test("soft sample: Knuth coin matches the integer formula and is partition-invariant") {
    import org.apache.spark.sql.functions._
    val scored = df.withColumn("s", (col("id") % 10).cast("double") / 10.0)
    val out = Sampling.softSampleByScore(scored, "id", col("s"))
      .select("id", "coin", "kept").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val expected = ((id * 2654435761L) % 4294967296L).toDouble / 4294967296.0
      assert(r.getDouble(1) == expected)
      assert(r.getBoolean(2) == (expected < (id % 10).toDouble / 10.0))
    }
    // score 0 keeps nothing, score 1 keeps everything
    val all = Sampling.softSampleByScore(scored, "id", lit(1.0))
      .where(col("kept")).count()
    val none = Sampling.softSampleByScore(scored, "id", lit(0.0))
      .where(col("kept")).count()
    assert(all == df.count() && none == 0)
    // repartitioning cannot change the kept set
    val a = Sampling.softSampleByScore(scored, "id", col("s"))
      .where(col("kept")).select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.softSampleByScore(scored.repartition(7), "id", col("s"))
      .where(col("kept")).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}

package graft.tools

import graft.core.Tables
import graft.functions.{HashFunctions, TextFunctions}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup stage chain (not part of the API). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    docs.count() // warm the scan
    time("normalize only")(docs.select(TextFunctions.normalizeForDedup(col("text")).as("n"))
      .agg(sum(length(col("n")))).head())
    time("sig k=16")(Dedup.minhashSignatures(docs, "doc_id", "text",
      Dedup.MinHashConfig(k = 16)).agg(count(lit(1))).head())
    time("sig k=128 (1st)")(Dedup.minhashSignatures(docs, "doc_id", "text").agg(count(lit(1))).head())
    time("sig k=128 (2nd)")(Dedup.minhashSignatures(docs, "doc_id", "text").agg(count(lit(1))).head())
    time("x01 minhashLsh e2e")(println("kept=" + Dedup.minhashLsh(docs, "doc_id", "text").count()))
    time("x02 simhash e2e")(println("sim kept=" + Dedup.simhash(docs, "doc_id", "text").count()))
    time("x03 ngram e2e")(println("ngram kept=" + Dedup.ngramJaccard(docs, "doc_id", "text").count()))
    // x03 stage breakdown
    locally {
      val cfg = Dedup.MinHashConfig()
      val sigs = time("x03a sigs persist")(
        Dedup.minhashSignatures(docs, "doc_id", "text", cfg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      time("x03a sigs count")(sigs.count())
      val cand = time("x03b estimate-gated cand")(
        Dedup.candidatePairsEstimateGated(sigs, cfg, 0.4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      time("x03b cand count")(println("cand=" + cand.count()))
      val sh = docs.select(col("doc_id").as("id"),
        array_distinct(TextFunctions.wordShingleHashes(col("text"), 3)).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("x03c shingle persist")(sh.count())
      val s1 = sh.select(col("id").as("src"), col("sh").as("sh1"))
      val s2 = sh.select(col("id").as("dst"), col("sh").as("sh2"))
      val pairs = time("x03d verify join")({
        val p = cand.join(s1, "src").join(s2, "dst")
          .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
          .withColumn("uni", size(array_union(col("sh1"), col("sh2"))).cast("double"))
          .where(col("uni") > 0 && col("inter") / col("uni") >= 0.8)
          .select("src", "dst")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println("pairs=" + p.count()); p
      })
      val comp = time("x03e CC")(
        graft.operators.ConnectedComponents.run(pairs))
      time("x03e CC count")(comp.count())
      time("x03f anti-join")(println("kept=" +
        docs.join(comp.where(col("id") =!= col("component"))
          .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti").count()))
    }
    spark.stop()
  }
}

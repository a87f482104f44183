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
    spark.stop()
  }
}

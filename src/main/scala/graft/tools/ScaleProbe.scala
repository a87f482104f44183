package graft.tools

import graft.core.Tables
import graft.operators.{Dedup, Packer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe (not part of the API): replicates the sf
  * corpus N× with salted near-duplicate copies and times the heavy
  * operators at 1× and N×, printing the wall-time ratio next to the
  * data ratio. The replication is the ADVERSARIAL shape for dedup —
  * every doc gains N−1 near-duplicates (a short ` repK` suffix keeps
  * pairwise Jaccard high), so candidate generation, exact verify, and
  * connected components all carry N× the nodes AND ~N²/2-per-cluster
  * the within-cluster pairs. A design that is secretly quadratic in
  * corpus size (all-pairs joins, driver-side closures, single-task
  * windows) shows up here as a ratio far above the data ratio; the
  * bucketed/star constructions should stay near-linear.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [factor]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label%-28s ${s}%8.2f s   (result rows: $n)")
      s
    }

    val docs1 = Tables.documents(spark, d).select("doc_id", "text")
      .localCheckpoint(true)
    val n1 = docs1.count()
    // replica k shifts ids into a disjoint range and appends a tiny
    // salt so copies are NEAR-dups (high Jaccard), not exact ones —
    // the worst case for LSH candidate volume
    val docsN = (0 until factor).map { k =>
      docs1.select((col("doc_id") + lit(k.toLong * 100000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(col("text"), lit(s" rep$k"))).as("text"))
    }.reduce(_ unionByName _).repartition(64).localCheckpoint(true)
    val nN = docsN.count()
    println(s"[scale] corpus 1x=$n1 docs, ${factor}x=$nN docs")

    val results = Seq(
      "minhashLsh" -> ((df: DataFrame) =>
        Dedup.minhashLsh(df, "doc_id", "text").count()),
      "spanTrim w=8" -> ((df: DataFrame) =>
        Dedup.spanTrim(df, "doc_id", "text", window = 8)
          .agg(sum("n_removed")).head().getLong(0)),
      "passageTrim w=10" -> ((df: DataFrame) =>
        Dedup.passageTrim(df, "doc_id", "text", window = 10)
          .agg(sum("n_blocks_kept")).head().getLong(0)),
      "exact dedup" -> ((df: DataFrame) =>
        Dedup.exact(df, "doc_id", "text").count()),
      "packExact 2048" -> ((df: DataFrame) => {
        val toks = df.select(col("doc_id"),
          transform(split(col("text"), " "),
            t => pmod(xxhash64(t), lit(30000)).cast("int")).as("tokens"))
        Packer.packExact(toks, "doc_id", "tokens", seqLen = 2048, eosId = 2)
          .count()
      })
    )
    results.foreach { case (name, op) =>
      val t1 = time(s"$name 1x")(op(docs1))
      val tN = time(s"$name ${factor}x")(op(docsN))
      println(f"[scale] $name%-28s time ratio ${tN / t1}%.1fx vs data ratio ${factor}x")
    }
    spark.stop()
  }
}

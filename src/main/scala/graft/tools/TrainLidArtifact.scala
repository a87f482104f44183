package graft.tools

import graft.operators.TrainedLid
import org.apache.spark.sql.SparkSession

/** Builds the committed wide-coverage LID artifact
  * (`fixtures/models/lid48`) — run once, commit the parquet; the
  * artifact is bit-reproducible from the repo alone (deterministic
  * synthesized corpus + exact-count training, see
  * [[graft.operators.TrainedLid.trainWideArtifact]]). Mirrors the
  * reference shipping a pretrained lid.176.bin alongside the code
  * (reference: src/llm_data_pipeline/quality/model.py:267-340). */
object TrainLidArtifact {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(TrainedLid.DefaultArtifactDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = TrainedLid.trainWideArtifact(spark, out)
    println(s"[lid] wrote ${m.langs.length}-language model " +
      s"(${m.buckets} buckets, ${m.ngram}-gram) to $out")
    spark.stop()
  }
}

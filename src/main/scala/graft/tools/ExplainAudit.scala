package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for representative
  * queries so pushdown / pruning / broadcast decisions can be reviewed
  * (and greps itself for the markers that matter at scale). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_project", "q03_segment_revenue", "q05_region_revenue",
        "q22_customers_without_orders", "d09_source_stats", "e01_cosine_knn")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      val plan = SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val hasPush = plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")
      println(s"[audit] $n pushedFilters=${hasPush} broadcast=${plan.contains("BroadcastHashJoin")} " +
        s"wholestage=${plan.contains("WholeStageCodegen")}")
    }
    spark.stop()
  }
}

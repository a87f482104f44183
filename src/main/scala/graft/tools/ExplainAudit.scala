package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for representative
  * queries so pushdown / pruning / broadcast decisions can be reviewed
  * (and greps itself for the markers that matter at scale). */
object ExplainAudit {

  /** Scale red flags in a formatted plan: whole-table single-partition
    * windows (`Window` with an EMPTY partition spec — every row in one
    * task), cartesian products, and non-broadcast nested-loop joins.
    *
    * FormattedMode renders a partitioned Window node as
    * `Arguments: [windowExprs], [partitionSpec], [orderSpec]` — THREE
    * top-level bracket groups — and simply OMITS an empty partition
    * list, leaving two. Detection counts top-level groups per Window
    * node's Arguments line (pinned against real Spark plans in
    * ExplainAuditSpec; an assumed token like `partitionBy=[]` never
    * appears and would make the check dead code). WindowGroupLimit is
    * excluded: Catalyst plans unpartitioned top-k as
    * TakeOrderedAndProject, and the trailing Window still trips the
    * detector. */
  def redFlags(plan: String): Seq[String] = {
    // A window spec renders as windowspecdefinition(partCols..., orderItems...,
    // specifiedwindowframe(...)). Partition columns are bare expressions;
    // order items always carry ASC/DESC. So: no partition columns iff the
    // FIRST argument is an order item or directly the frame.
    def firstArgOf(src: String, from: Int): String = {
      var depth = 0
      var i = from
      val sb = new StringBuilder
      while (i < src.length) {
        val c = src.charAt(i)
        if (c == ')' && depth == 0) return sb.toString
        if (c == ',' && depth == 0) return sb.toString
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        sb.append(c)
        i += 1
      }
      sb.toString
    }
    val flags = scala.collection.mutable.ArrayBuffer[String]()
    val marker = "windowspecdefinition("
    var idx = plan.indexOf(marker)
    while (idx >= 0 && !flags.contains("unpartitioned-window")) {
      val arg = firstArgOf(plan, idx + marker.length).trim
      if (arg.startsWith("specifiedwindowframe") ||
          arg.contains(" ASC") || arg.contains(" DESC"))
        flags += "unpartitioned-window"
      idx = plan.indexOf(marker, idx + marker.length)
    }
    if (plan.contains("CartesianProduct")) flags += "cartesian"
    if (plan.contains("NestedLoopJoin") && !plan.contains("BroadcastNestedLoopJoin"))
      flags += "non-broadcast-nested-loop"
    flags.toSeq
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    if (args.length > 1 && args(1) == "--sweep") { sweep(d); return }
    if (args.length > 2 && args(1) == "--executed") {
      executed(d, args(2), args.drop(3).toSeq); return
    }
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

  /** EXECUTED-plan dump (the r12 verdict's evidence asks): run each
    * query to completion and write (a) every SUB-execution's formatted
    * plan — the stages a query materializes during CONSTRUCTION
    * (eager localCheckpoints, persisted pair tables) whose expressions
    * never appear in the final-stage plan (the r12 jaccard dumps were
    * vacuous for exactly this reason), captured via a
    * QueryExecutionListener — and (b) the final ADAPTIVE plan after
    * execution (isFinalPlan=true), which shows runtime exchange reuse
    * the static dump cannot (the q46 claim). One file per query under
    * `outDir/<name>_executed.txt`. */
  def executed(d: String, outDir: String, names: Seq[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val captured = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        captured.add(funcName -> qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { n =>
      captured.clear()
      val df = SparkEntry.queries(n)(spark, d)
      // foreach: full-plan execution on the df's OWN QueryExecution (a
      // noop write would wrap it in a separate command), no column
      // pruning, so the final adaptive plan below is the real one
      df.foreach(_ => ())
      Thread.sleep(3000) // listener bus drains asynchronously
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val sb = new StringBuilder
      sb.append(s"########## $n — FINAL ADAPTIVE PLAN (after execution) ##########\n")
      sb.append(finalPlan).append("\n")
      val subs = captured.toArray(Array.empty[(String, String)])
      subs.zipWithIndex.foreach { case ((fn, p), i) =>
        sb.append(s"\n########## $n — sub-execution ${i + 1}/${subs.length} ($fn) ##########\n")
        sb.append(p).append("\n")
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_executed.txt"),
        sb.toString.getBytes("UTF-8"))
      println(s"[executed] $n -> $outDir/${n}_executed.txt (${subs.length} sub-executions)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  /** Sweep EVERY declared query's physical plan for scale red flags —
    * one line per query, SWEEP-FAIL if any flag fires. Plan-only (no
    * execution), so the whole inventory audits in seconds. */
  def sweep(d: String): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      // st01/w01/k02 execute side effects while building; plan-audit them too
      try {
        val plan = fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val flags = redFlags(plan)
        if (flags.nonEmpty) { bad += 1; println(s"[sweep] $n FLAGS: ${flags.mkString(",")}") }
        else println(s"[sweep] $n ok")
      } catch {
        case e: Throwable =>
          bad += 1 // an un-auditable plan is a failure, not a pass
          println(s"[sweep] $n PLAN-ERROR ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println(if (bad == 0) "[sweep] PASS: no scale red flags in any query plan"
      else s"[sweep] FAIL: $bad flagged or unplannable queries")
    spark.stop()
  }
}

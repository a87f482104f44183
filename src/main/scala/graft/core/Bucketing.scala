package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a table ONCE at write time so
  * every later equi-join or aggregation on the bucket key runs with no
  * Exchange at all.
  *
  * This is the 100-TB join strategy the one-shot `repartition()` can't
  * give you: a fact table that is joined on the same key by many
  * queries (orders x lineitem, doc_id x signatures, user_id x events)
  * pays its shuffle once, at ingest, and never again. Two tables
  * bucketed into the SAME number of buckets on their join key sort-merge
  * join with zero Exchange on either side; a groupBy on the bucket key
  * needs no partial/final split. At 1000 executors the avoided
  * cross-network shuffle of the large side is usually the single
  * largest cost in the plan.
  *
  * Spark implements bucket pruning + shuffle-free scans only through
  * the catalog (`saveAsTable`) — a plain parquet path write drops the
  * bucket spec, which is why these helpers are table-name based.
  * Semantics beyond placement are unchanged, so callers that lack a
  * catalog simply keep the shuffled plan; nothing here is required for
  * correctness.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table, hash-bucketed AND sorted
    * on `key` (+ optional secondary sort columns). The sort makes the
    * later sort-merge join skip its per-task sort too: the scan is
    * already in join order. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key, sortCols: _*)
      .saveAsTable(table)

  /** Composite-key variant: bucket AND sort on `keys` (e.g. a MinHash
    * band index on (band_id, band_hash)); the bucket spec is keys.head
    * + keys.tail, sort covers all keys so same-spec joins skip their
    * per-task sort too. */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                         buckets: Int): Unit = {
    require(keys.nonEmpty)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucket-count tables on `key`. With matching
    * bucket specs Catalyst plans this as a sort-merge join whose both
    * sides read bucket files directly — no ShuffleExchange. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** Drop `table` from the catalog AND delete its default warehouse
    * location. With the in-memory catalog a prior session's table files
    * outlive the (forgotten) catalog entry, and a later CTAS onto the
    * non-empty location fails — so physical cleanup is part of drop. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
  }

  /** (directories scanned, any partition filter pushed) over every
    * file scan in `df`'s executed plan — the plan-level proof that
    * partition pruning engaged (the b01 convention, for scans instead
    * of shuffles). Descends AQE wrappers like [[shuffleExchanges]]. */
  def scannedPartitions(df: DataFrame): (Int, Boolean) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: QueryStageExec => scans(s.plan)
        case _ => Nil
      }
      self ++ inner ++ p.children.flatMap(scans)
    }
    val ss = scans(df.queryExecution.executedPlan)
    require(ss.nonEmpty, "scannedPartitions: no file scan in plan")
    (ss.map(_.selectedPartitions.partitionCount).sum,
      ss.exists(_.partitionFilters.nonEmpty))
  }

  /** Count how many shuffle Exchanges the executed plan of `df` would
    * run — the spec-side proof that a bucketed plan is shuffle-free.
    * Descends into AQE wrapper nodes (AdaptiveSparkPlanExec,
    * QueryStageExec), whose inner plans a plain `collect` over the top
    * tree never visits. */
  def shuffleExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def count(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case s: QueryStageExec => count(s.plan)
        case _ => 0
      }
      self + inner + p.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }
}

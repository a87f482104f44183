package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism guards for compute-heavy per-row operators.
  *
  * A small parquet file arrives as one input split, so an expensive
  * map (MinHash, SimHash, shingling) would run on one core no matter
  * how many the cluster has. At 100 TB inputs already carry thousands
  * of splits and the guard is a no-op; it only kicks in when the scan
  * under-supplies partitions relative to the cluster.
  */
object Partitioning {
  def ensureParallelism(df: DataFrame, minFactor: Int = 1): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism * minFactor
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

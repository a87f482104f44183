package graft.core

import org.apache.hadoop.fs.Path
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

  /** Repartition iff the FILE source under-supplies splits. Decided from
    * the (cached) file listing + sizes — never `df.rdd`, which would
    * force a second full physical planning of the query per call. A
    * non-file DataFrame (memory relation, shuffle output) is returned
    * unchanged: those already carry defaultParallelism or
    * shuffle.partitions worth of splits. */
  def ensureParallelism(df: DataFrame, minFactor: Int = 1): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism * minFactor
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    // few files: is their byte count enough for `target` scan splits?
    val conf = spark.sessionState.newHadoopConf()
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val totalBytes = files.iterator.map { f =>
      val p = new Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val approxSplits = math.max(files.length, (totalBytes / maxSplit).toInt)
    if (approxSplits < target) df.repartition(target) else df
  }
}

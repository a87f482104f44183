package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Misra-Gries heavy hitters: approximate top frequent items with
  * bounded memory — the scale path for "most common tokens / URLs /
  * fingerprints" over 100 TB, where an exact `groupBy(item).count`
  * must shuffle every distinct item.
  *
  * Each partition maintains a k-counter Misra-Gries summary (classic
  * streaming algorithm, Misra & Gries 1982); partials merge by counter
  * addition followed by the standard decrement-compaction. Guarantees:
  * any item with true frequency > N/k survives, and each reported count
  * undercounts by at most N/k. The summaries (k entries each) are the
  * only shuffled state.
  */
object HeavyHitters {

  private[operators] def mergeCompact(acc: mutable.Map[String, Long],
                                      k: Int): mutable.Map[String, Long] = {
    if (acc.size <= k) return acc
    // decrement all by the (size-k)-th largest excess via median-of-counts
    // strategy: repeatedly subtract the minimum count until <= k survive
    while (acc.size > k) {
      val dec = acc.valuesIterator.min
      val dead = acc.iterator.filter(_._2 <= dec).map(_._1).toList
      acc.mapValuesInPlace((_, v) => v - dec)
      dead.foreach(acc.remove)
    }
    acc
  }

  /** Top-`k`-ish items of `col` with lower-bound counts. Deterministic
    * given a fixed partitioning; intended for candidate generation (an
    * exact count of the survivors is one cheap semi-joined groupBy). */
  def topK(df: DataFrame, column: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(column).cast("string")).as[String]
      .mapPartitions { it =>
        val acc = mutable.Map[String, Long]()
        it.foreach { v =>
          if (v != null) {
            acc.updateWith(v) { case Some(c) => Some(c + 1); case None => Some(1L) }
            if (acc.size > 2 * k) mergeCompact(acc, k)
          }
        }
        Iterator.single(mergeCompact(acc, k).toMap)
      }(Encoders.kryo[Map[String, Long]])
    if (partials.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(column, org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("count_lower_bound", org.apache.spark.sql.types.LongType))))
    val merged = partials.reduce { (a, b) =>
      val acc = mutable.Map[String, Long](a.toSeq: _*)
      b.foreach { case (kk, v) =>
        acc.updateWith(kk) { case Some(c) => Some(c + v); case None => Some(v) }
      }
      mergeCompact(acc, k).toMap
    }
    merged.toSeq.toDF(column, "count_lower_bound")
      .orderBy(desc("count_lower_bound"), col(column))
  }

  /** Exact counts for the heavy-hitter survivors: broadcast semi-join of
    * the candidates back over the data — one scan, shuffle only on the
    * <=k surviving keys. */
  def topKExact(df: DataFrame, column: String, k: Int): DataFrame = {
    val candidates = topK(df, column, k).select(col(column))
    df.join(broadcast(candidates), Seq(column), "left_semi")
      .groupBy(column).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col(column))
      .limit(k)
  }
}

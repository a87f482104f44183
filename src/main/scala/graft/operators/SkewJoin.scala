package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handles most cases at runtime; this explicit variant
  * is for the pathological shapes AQE can't split (one key ≫ a single
  * partition, e.g. the empty-URL or boilerplate-fingerprint key in a
  * web corpus): the left (large, skewed) side gets a random salt in
  * [0, buckets), the right side is replicated `buckets` times, and the
  * join key becomes (key, salt) — spreading the hot key over `buckets`
  * tasks at the cost of replicating the smaller side.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with `buckets`-way salting.
    * `right` should be the smaller side (it is replicated). */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      buckets: Int = 16): DataFrame = {
    require(buckets > 1)
    val salted = left.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Aggregate-then-merge for skewed groupBy: pre-aggregate on
    * (key, salt), then merge partials on key — two shuffles, but the
    * first spreads a hot key across `buckets` reducers (the manual form
    * of map-side partial aggregation for high-cardinality-value
    * aggregates like collect_list). */
  def saltedCollectList(df: DataFrame, key: String, valueCol: String,
                        buckets: Int = 16): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__partial"))).as(s"${valueCol}_list"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixture control.
  *
  * Unlike `df.sample`/`sampleBy` (Bernoulli per-row randomness: only
  * approximate fractions, and resample-unstable across runs), these are
  * exact and reproducible: rows are ranked inside each stratum by a
  * content hash and the top ceil(frac*n) are kept. At scale this is one
  * window shuffle on the stratum key — the same cost as any grouped
  * ranking — and the selection is stable under re-partitioning,
  * re-runs, and engine changes (md5 is bit-defined), which is what a
  * reproducible data mixture needs.
  */
object Sampling {

  /** Exact stratified sample: keep ceil(frac * n) rows per stratum,
    * selected by ascending md5 of `hashCol` (a stable id column). */
  def stratifiedExact(df: DataFrame, strataCol: String, frac: Double,
                      hashCol: String): DataFrame = {
    require(frac > 0 && frac <= 1)
    val w = Window.partitionBy(col(strataCol)).orderBy(md5(col(hashCol).cast("string")))
    val cw = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .where(col("__rn") <= ceil(lit(frac) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Per-stratum cap (take at most `maxRows` per stratum, same stable
    * hash order) — the "downsample overrepresented sources" operation. */
  def capPerStratum(df: DataFrame, strataCol: String, maxRows: Int,
                    hashCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(md5(col(hashCol).cast("string")))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxRows)
      .drop("__rn")
  }

  /** Weighted mixture: per-stratum fractions (e.g. lang → weight),
    * missing strata default to `defaultFrac`. */
  def mixture(df: DataFrame, strataCol: String, fractions: Map[String, Double],
              defaultFrac: Double, hashCol: String): DataFrame = {
    val fracCol = fractions.foldLeft(lit(defaultFrac)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol)).orderBy(md5(col(hashCol).cast("string")))
    val cw = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .where(col("__rn") <= ceil(fracCol * col("__n")))
      .drop("__rn", "__n")
  }
}

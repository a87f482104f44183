package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For every left row, attach the most recent right row with
  * `right.ts <= left.ts` sharing the join key (backward direction),
  * optionally within a lookback tolerance.
  *
  * Implementation is composition, not a custom physical operator (the
  * preferred path when built-ins can express the semantics): tag both
  * sides, union, and run one `last(ignoreNulls)` window per key ordered
  * by (ts, side) — a single shuffle on the key, no range self-join, no
  * per-key driver loops. At 100 TB that is the same cost as any keyed
  * window aggregation; ties at equal timestamps resolve right-then-left
  * so a right row at exactly left.ts matches.
  */
object AsOfJoin {

  /** `left` gains `asof_<col>` for each of `matchedCols` from the latest
    * `right` row with rightTs <= leftTs per `key`; unmatched rows (or
    * matches older than `toleranceUs` in the units of the ts casts) get
    * nulls. */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               matchedCols: Seq[String], toleranceUs: Long = Long.MaxValue): DataFrame = {
    val mExpr = struct(matchedCols.map(col) :+ col(rightTs).cast("long").as("__mts"): _*)
    val mType = right.select(mExpr.as("m")).schema.head.dataType
    val lExpr = struct(left.columns.map(col): _*)
    val lType = left.select(lExpr.as("l")).schema.head.dataType

    val lt = left.select(col(key).as("__k"), col(leftTs).cast("long").as("__ts"),
      lit(1).as("__side"), lit(null).cast(mType).as("__m"), lExpr.as("__l"))
    val rt = right.select(col(key).as("__k"), col(rightTs).cast("long").as("__ts"),
      lit(0).as("__side"), mExpr.as("__m"), lit(null).cast(lType).as("__l"))

    // __m as the final sort key makes equal-(ts,side) right rows resolve
    // deterministically (struct compare = matchedCols order)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"), col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lt.unionByName(rt)
      .withColumn("__last", last(col("__m"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn("__last",
        when(col("__last").isNotNull && col("__ts") - col("__last.__mts") <= toleranceUs,
          col("__last")))
    val withCols = matchedCols.foldLeft(matched) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__last.$c"))
    }
    withCols.select(left.columns.map(c => col(s"__l.$c").as(c))
      ++ matchedCols.map(c => col(s"asof_$c")): _*)
  }

  /** Forward direction: `left` gains `asof_<col>` from the EARLIEST
    * `right` row with rightTs >= leftTs per `key` (a right row exactly
    * at leftTs matches); matches further ahead than `toleranceUs` get
    * nulls. Same single keyed window as [[backward]], mirrored: left
    * rows sort before right rows at equal ts and `first(ignoreNulls)`
    * scans the following frame. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              matchedCols: Seq[String], toleranceUs: Long = Long.MaxValue): DataFrame = {
    val mExpr = struct(matchedCols.map(col) :+ col(rightTs).cast("long").as("__mts"): _*)
    val mType = right.select(mExpr.as("m")).schema.head.dataType
    val lExpr = struct(left.columns.map(col): _*)
    val lType = left.select(lExpr.as("l")).schema.head.dataType

    val lt = left.select(col(key).as("__k"), col(leftTs).cast("long").as("__ts"),
      lit(0).as("__side"), lit(null).cast(mType).as("__m"), lExpr.as("__l"))
    val rt = right.select(col(key).as("__k"), col(rightTs).cast("long").as("__ts"),
      lit(1).as("__side"), mExpr.as("__m"), lit(null).cast(lType).as("__l"))

    // ascending (__ts, __side, __m): equal-ts right rows land inside the
    // following frame, and ties between right rows resolve by struct
    // compare (matchedCols order) — deterministic at any parallelism
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"), col("__m"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = lt.unionByName(rt)
      .withColumn("__next", first(col("__m"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .withColumn("__next",
        when(col("__next").isNotNull && col("__next.__mts") - col("__ts") <= toleranceUs,
          col("__next")))
    val withCols = matchedCols.foldLeft(matched) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__next.$c"))
    }
    withCols.select(left.columns.map(c => col(s"__l.$c").as(c))
      ++ matchedCols.map(c => col(s"asof_$c")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus snapshot maintenance — the Delta-MERGE shape
  * (`MERGE INTO base USING changes ON key WHEN MATCHED ...`), built from
  * one full-outer shuffle join so it runs on plain parquet with no table
  * format dependency.
  *
  * A 100 TB training corpus is not rebuilt per crawl: each new batch
  * arrives as a change set (new docs, re-crawled docs, takedowns) and is
  * folded into the standing snapshot. The reference has no incremental
  * path (every run is a full rebuild); this operator is the
  * beyond-reference maintenance primitive that makes x07-style
  * incremental dedup useful — dedup decides the change set, MERGE applies
  * it.
  *
  * Scale shape: ONE sort-merge join on the key (both sides shuffle once;
  * AQE handles skewed keys), then a zero-shuffle projection. No windows,
  * no driver materialization — the change set may itself be huge.
  */
object MergeUpsert {

  /** Fold a change set into a base snapshot.
    *
    * `changes` must carry `key`, an `op` column (`"U"` = upsert,
    * `"D"` = delete), and the payload columns (same names as in `base`;
    * null payload on an upsert keeps the base value — partial updates).
    * Any other op value fails the run loudly rather than silently
    * keeping rows.
    *
    * Output: the new snapshot — all payload columns plus `action` in
    * {`keep`, `update`, `insert`} recording what happened to each row.
    * Deleted keys are absent. A delete for a missing key is a no-op;
    * an upsert for a missing key is an insert.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   payload: Seq[String], opCol: String = "op"): DataFrame = {
    val b = payload.foldLeft(base)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__in_base", lit(true))
    val c = payload.foldLeft(changes)((df, p) => df.withColumnRenamed(p, s"__c_$p"))
    val joined = b.join(c, Seq(key), "full_outer")
    val op = col(opCol)
    val badOp = op.isNotNull && op =!= "U" && op =!= "D"
    val merged = joined
      .withColumn("action",
        when(badOp, raise_error(concat(lit("MergeUpsert: unknown op "), op)))
          .when(op === "U" && col("__in_base"), "update")
          .when(op === "U", "insert")
          .otherwise("keep"))
      .where(op.isNull || op =!= "D")
      // a bare-delete key that never existed yields an all-null row from
      // the full outer join — drop it (delete of a missing key is a no-op)
      .where(col("__in_base") || op.isNotNull)
    val out = payload.foldLeft(merged)((df, p) =>
      df.withColumn(p, coalesce(col(s"__c_$p"), col(s"__b_$p"))))
    out.select(col(key) +: payload.map(col) :+ col("action"): _*)
  }

  /** The inverse of [[applyChanges]]: derive the change log that turns
    * snapshot `old` into snapshot `next` — CDC between two corpus
    * versions when the producer ships full snapshots instead of deltas.
    *
    * Output: one row per differing key with `change` in {`I`, `U`, `D`}
    * and the payload columns at their `next` value (null for deletes).
    * Keys whose payload is unchanged (null-safe compare over all payload
    * columns) are absent. Same scale shape as the MERGE itself: one
    * full-outer sort-merge join, zero windows.
    *
    * Round-trip law (spec-enforced): applyChanges(old, diff(old, next))
    * has exactly next's keys and payloads.
    */
  def diff(old: DataFrame, next: DataFrame, key: String,
           payload: Seq[String]): DataFrame = {
    val o = payload.foldLeft(old)((df, c) => df.withColumnRenamed(c, s"__o_$c"))
      .withColumn("__in_old", lit(true))
    val n = payload.foldLeft(next)((df, c) => df.withColumnRenamed(c, s"__n_$c"))
      .withColumn("__in_next", lit(true))
    val joined = o.join(n, Seq(key), "full_outer")
    val same = payload.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _)
    val classified = joined
      .withColumn("change",
        when(col("__in_old").isNull, "I")
          .when(col("__in_next").isNull, "D")
          .when(!same, "U"))
      .where(col("change").isNotNull)
    val out = payload.foldLeft(classified)((df, c) =>
      df.withColumn(c, col(s"__n_$c")))
    out.select(col(key) +: col("change") +: payload.map(col): _*)
  }
}

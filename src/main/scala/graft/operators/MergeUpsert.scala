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
}

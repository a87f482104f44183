package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the
  * constraint-report operator a production ingest gate runs before
  * promoting a batch (the shape popularized by AWS Deequ / dbt tests,
  * both public designs): each check is a row-level predicate, and the
  * report is ONE aggregate pass over the data (every check folds to a
  * conditional count inside the same two-phase hash aggregate — no
  * per-check scan, no shuffle beyond the single agg), plus optional
  * uniqueness checks that ride the same pass as count(DISTINCT ...).
  *
  * Output: one row per check —
  * (check, n_rows, n_violations, violation_frac, passed). */
object Expectations {

  /** A named row-level expectation: a row VIOLATES the check when
    * `predicate` is false or NULL (null-hostile on purpose — an
    * unknown is not a pass). */
  case class Check(name: String, predicate: Column)

  /** Not-null expectation for a column. */
  def notNull(colName: String): Check =
    Check(s"${colName}_not_null", col(colName).isNotNull)

  /** Range expectation (inclusive bounds). */
  def between(colName: String, lo: Double, hi: Double): Check =
    Check(s"${colName}_between", col(colName) >= lo && col(colName) <= hi)

  /** Membership expectation. */
  def isIn(colName: String, allowed: Seq[String]): Check =
    Check(s"${colName}_in_set", col(colName).isInCollection(allowed))

  /** Evaluate all checks in ONE aggregate pass; `uniqueCols` adds a
    * `<col>_unique` check per column (count(DISTINCT col) = n_rows)
    * evaluated inside the same aggregate. */
  def report(df: DataFrame, checks: Seq[Check],
             uniqueCols: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueCols.nonEmpty, "no expectations given")
    // outer coalesce: sum over ZERO rows is NULL — an empty batch has
    // no violations, not unknown ones
    val rowAggs = checks.map(c =>
      coalesce(sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"__v_${c.name}"))
    val uniqAggs = uniqueCols.map(u =>
      (count(lit(1)) - countDistinct(col(u))).as(s"__v_${u}_unique"))
    val aggs = (rowAggs ++ uniqAggs) :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = checks.map(_.name) ++ uniqueCols.map(u => s"${u}_unique")
    val rows = explode(array(names.map { n =>
      struct(lit(n).as("check"), col(s"__v_$n").as("n_violations"))
    }: _*))
    one.select(col("__n"), rows.as("r"))
      .select(col("r.check").as("check"),
        col("__n").as("n_rows"),
        col("r.n_violations").as("n_violations"),
        round(col("r.n_violations").cast("double")
          / greatest(col("__n"), lit(1L)), 6).as("violation_frac"),
        (col("r.n_violations") === 0L).as("passed"))
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over a testdata scale-factor directory.
  *
  * Mirrors the reference's per-step parquet-directory handoff contract
  * (reference: src/llm_data_pipeline/core.py:240-292 resolve_io_paths) but
  * as a plain reader: each logical table is one parquet file/dir under
  * `dir`. Reads are lazy; Catalyst pushes filters and prunes columns down
  * to the scan, which is what makes the same code viable at 100 TB —
  * the scan only materializes the columns/rows the plan needs.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

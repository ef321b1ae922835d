package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and resolve tables through
  * here, so the same query runs unchanged at any scale factor — the
  * sf-dir is the only thing that changes between the 6k-row smoke run
  * and a 100 TB production layout (where these would be metastore
  * tables; the parquet scan keeps column pruning + predicate pushdown
  * either way).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects, so we read nanos as long and
    * truncate to micros (legal range here, and equality-safe: truncation
    * matches DuckDB's own micro-precision arithmetic for positive
    * epochs) — and native TIMESTAMP(MICROS) with isAdjustedToUTC=false,
    * which Spark surfaces as TIMESTAMP_NTZ. Branch on the loaded type
    * and normalize both to TIMESTAMP: every session here runs with
    * spark.sql.session.timeZone=UTC, so the NTZ→TZ cast is a pure type
    * relabel (identical micros), keeping unix_micros/window arithmetic
    * downstream valid for either layout. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

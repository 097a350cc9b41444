package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the testdata star schema (see TESTDATA.md).
  *
  * All loaders are lazy parquet scans — column pruning and predicate
  * pushdown are left to Catalyst, so an operator that selects 2 columns
  * reads 2 columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** All loads normalize TIMESTAMP_NTZ columns to TimestampType: the
    * driver's parquet writes TIMESTAMP(isAdjustedToUTC=false) (since r4),
    * which Spark reads as NTZ and half the timestamp functions
    * (unix_micros, window, watermarks) reject. With the engine-wide UTC
    * session zone the cast is micros-preserving and matches DuckDB's
    * naive-as-UTC epoch_us.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark reads as a
    * nanosecond Long under `nanosAsLong`; normalize to a microsecond
    * TimestampType column (floor division — matches DuckDB's ns→µs
    * truncation) so downstream operators see a plain timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    // integer `div`, NOT `/`: Spark's `/` on longs is double division, and
    // epoch-nanos (~1.7e18) exceed a double's 2^53 integer range — the
    // rounding jitter shows up as ±1µs timestamp drift.
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // NTZ already normalized by load
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All time handling is anchored on integer epoch arithmetic: `events.ts`
  * is parquet TIMESTAMP(NANOS), which Spark cannot represent natively, so
  * it is read as a raw Long (nanos) via `spark.sql.legacy.parquet.nanosAsLong`
  * and ms/us/timestamp views are derived with integer `div` (double math
  * would lose precision at 1e18). This keeps every derived time column
  * bit-identical to the DuckDB oracle's `epoch_ms`/`epoch_us`.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Sensor-telemetry view of `events`: the reference's SensorReading domain
    * (reference Q/util/SensorSource.java:48-66, Q/util/SensorReading.java:25-29)
    * mapped onto the driver's events table per FIXTURES.md §2:
    * `user_id % 80` -> sensor id, `value` -> temperature.
    *
    * Columns: event_id, sensor_id, ts_ms, ts_us (exact integer epochs),
    * ts (TimestampType, microsecond truncation of the nano timestamp),
    * value, event_type.
    */
  def sensorReadings(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      concat(lit("sensor_"), col("user_id") % 80).as("sensor_id"),
      expr("ts div 1000000").as("ts_ms"),
      expr("ts div 1000").as("ts_us"),
      expr("timestamp_micros(ts div 1000)").as("ts"),
      col("value"),
      col("event_type"))
}

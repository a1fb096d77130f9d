package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming run of the reference's flagship program
  * (Q/AverageSensorReadings.java:61-79): SensorSource → °F→°C → per-sensor
  * 5 s tumbling event-time window average → console sink (K1), as a real
  * `writeStream` with a checkpointLocation (F14).
  *
  * Usage: runMain graft.streaming.StreamingMain [durationSec] [rowsPerSec]
  */
object StreamingMain {
  def main(args: Array[String]): Unit = {
    val durationSec = args.headOption.map(_.toInt).getOrElse(15)
    val rowsPerSec = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-average-sensor-readings")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState (the SensorSource random walk) requires the
      // RocksDB state store (F12).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, durationSec, rowsPerSec)
    spark.stop()
  }

  /** The flagship pipeline on a caller-owned session (ReferencePrograms
    * shares one session across all five programs — only main() may stop it). */
  def run(spark: SparkSession, durationSec: Int, rowsPerSec: Int): Unit = {
    val checkpoint = Files.createTempDirectory("graft_flagship_ckpt").toString
    val readings = SensorSource.stream(spark, rowsPerSec)
      // °F→°C map (T5) then event-time + watermark (E1, 5 s bound —
      // Q/util/SensorTimeAssigner.java:33).
      .withColumn("temp_c", (col("value") - 32) * 5.0 / 9.0)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "5 seconds")
      .groupBy(col("sensor_id"), window(col("ts"), "5 seconds"))
      .agg(avg(col("temp_c")).as("avg_temp"))
      .select(col("sensor_id"), col("window.end").as("window_end"), col("avg_temp"))

    val query = readings.writeStream
      .format("console")
      .outputMode("update")
      .option("truncate", "false")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    query.awaitTermination(durationSec * 1000L)
    query.stop()
  }
}

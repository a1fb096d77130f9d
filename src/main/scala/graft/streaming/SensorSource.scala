package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import Model._

/** S1 — streaming twin of the reference's SensorSource
  * (Q/util/SensorSource.java:32-71): N simulated sensors, each temperature
  * a gaussian random walk (start 65 + N(0,20), step N(0,0.5)).
  *
  * Spark rendering: the built-in `rate` source provides the unbounded tick
  * stream (offsets checkpointed ⇒ replayable, which the reference source
  * is NOT — an upgrade the consistency matrix K8 requires for
  * exactly-once); ticks are mapped to (sensor, seq) deterministically and
  * a keyed StatefulProcessor holds each sensor's current temperature —
  * the walk is seeded, so any replay regenerates identical readings.
  *
  * Gaussians come from a splitmix64 hash of (sensor, seq) fed through
  * Box-Muller — pure f(seed, sensor, seq), no java.util.Random state.
  */
object SensorSource {

  /** splitmix64 finalizer — deterministic 64-bit mix. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def uniform(z: Long): Double = ((z >>> 11).toDouble + 0.5) / 9007199254740992.0

  /** Standard normal via Box-Muller on two hashed uniforms. */
  def gaussian(seed: Long, sensor: Long, seq: Long): Double = {
    val h1 = mix64(seed ^ mix64(sensor) ^ mix64(seq * 2))
    val h2 = mix64(seed ^ mix64(sensor) ^ mix64(seq * 2 + 1))
    val u1 = uniform(h1)
    val u2 = uniform(h2)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** The per-sensor random walk: temp(s, 0) = 65 + 20·g(s,0);
    * temp(s, n) = temp(s, n−1) + 0.5·g(s,n). Pure function of the seed. */
  class RandomWalkProcessor(seed: Long)
      extends StatefulProcessor[Long, (Long, Long, Long), SensorEvent] {
    @transient private var temp: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      temp = getHandle.getValueState[Double]("temp", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(sensor: Long, rows: Iterator[(Long, Long, Long)],
                                 tv: TimerValues): Iterator[SensorEvent] = {
      // rows: (seq, ts_us, sensor) — fold in seq order for determinism.
      val out = Seq.newBuilder[SensorEvent]
      var t = if (temp.exists) Some(temp.get) else None
      rows.toSeq.sortBy(_._1).foreach { case (seq, tsUs, _) =>
        val next = t match {
          case None    => 65.0 + gaussian(seed, sensor, 0L) * 20.0
          case Some(v) => v + gaussian(seed, sensor, seq) * 0.5
        }
        t = Some(next)
        out += SensorEvent(s"sensor_$sensor", seq * 1000 + sensor, tsUs, next)
      }
      t.foreach(temp.update)
      out.result().iterator
    }
  }

  /** Unbounded streaming source: `rowsPerSecond` readings/s spread over
    * `nSensors` sensors — the reference's 10-sensors-at-100-ev/s shape.
    * Deterministic in (sensor, seq); timestamps come from the rate source. */
  def stream(spark: SparkSession, rowsPerSecond: Int = 100, nSensors: Int = 10,
             seed: Long = 42L): Dataset[SensorEvent] = {
    implicit val tupleEnc = Encoders.product[(Long, Long, Long)]
    implicit val outEnc = Encoders.product[SensorEvent]
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .load()
      .select((col("value") / nSensors).cast("long").as("seq"),
        unix_micros(col("timestamp")).as("ts_us"),
        (col("value") % nSensors).cast("long").as("sensor"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)(Encoders.scalaLong)
      .transformWithState(new RandomWalkProcessor(seed), TimeMode.None(), OutputMode.Update())
  }

  /** Bounded batch twin of the same generator (for tests / oracles): n
    * readings per sensor at a fixed cadence, identical values to what the
    * streaming walk produces for the same (seed, sensor, seq). */
  def batch(spark: SparkSession, nSensors: Int, nPerSensor: Int, seed: Long = 42L,
            startUs: Long = 0L, periodUs: Long = 100000L): Dataset[SensorEvent] = {
    implicit val outEnc = Encoders.product[SensorEvent]
    import spark.implicits._
    spark.range(0, nSensors.toLong).as[Long].flatMap { sensor =>
      var t = 0.0
      (0 until nPerSensor).map { seq =>
        t = if (seq == 0) 65.0 + gaussian(seed, sensor, 0L) * 20.0
            else t + gaussian(seed, sensor, seq.toLong) * 0.5
        SensorEvent(s"sensor_$sensor", seq.toLong * 1000 + sensor, startUs + seq * periodUs, t)
      }
    }
  }
}

package graft.streaming

/** Typed event model for the streaming layer — the Spark rendering of the
  * reference's POJO domain (reference Q/util/SensorReading.java:25-29,
  * Q/data/SmokeLevel.java:18-21, Q/data/Alert.java:23-24). Case classes +
  * derived Encoders replace Flink's TypeInformation reflection
  * (SURVEY.md §1.3).
  */
object Model {

  /** One sensor reading. `ts_us` is exact integer event time (µs) so that
    * processors stay in lockstep with the batch twins' integer epoch math;
    * `event_id` is the deterministic arrival tie-breaker. */
  case class SensorEvent(sensor_id: String, event_id: Long, ts_us: Long, value: Double)

  /** Alert emitted by the timer / co-process processors
    * (reference Q/data/Alert.java:23-24). */
  case class Alert(sensor_id: String, ts_ms: Long, value: Double, message: String)

  /** Output of [[Processors.DeltaAlertProcessor]] — schema matches the q08
    * batch twin exactly (sensor_id, event_id, value, delta). */
  case class DeltaAlert(sensor_id: String, event_id: Long, value: Double, delta: Double)

  /** Output of [[Processors.CountWindowProcessor]] — schema matches the q13
    * batch twin exactly (sensor_id, grp, n_events, avg_value). */
  case class CountWindowRow(sensor_id: String, grp: Long, n_events: Long, avg_value: Double)

  /** Output of [[Processors.RollingMaxProcessor]] — the per-event running
    * argmax record, the exact Update-mode semantics of the reference's
    * rolling reduce (Q/KeyedTransformations.java:55-62). */
  case class RunningMax(sensor_id: String, event_id: Long, value: Double)

  /** Tagged-union envelope for connected streams (M2/M3): Flink's
    * `connect` pairs two streams of different types into one co-processed
    * stream; Spark has no heterogeneous connect, so both sides are mapped
    * into this envelope and unioned (SURVEY.md §2.7 M2 option (a)).
    * `kind` is "ctrl" or "data"; control rows carry `level`, data rows
    * carry `value`. */
  case class Envelope(kind: String, sensor_id: String, event_id: Long, ts_us: Long,
                      value: Double, level: String)
}

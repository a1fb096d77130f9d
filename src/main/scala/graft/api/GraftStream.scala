package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, ForeachWriter, KeyValueGroupedDataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The fluent DataStream-style surface (SURVEY.md §7.1): a thin, typed
  * wrapper over Dataset/KeyValueGroupedDataset so a user of the reference
  * writes the same chain — `source.filter(...).map(...).keyBy(...)
  * .reduce(...).print()` (Q/BasicTransformations.java:47-81,
  * Q/KeyedTransformations.java:43-67) — and gets Structured Streaming
  * underneath. Each verb delegates 1:1 to the Catalyst/streaming
  * primitive documented in SURVEY.md §2; nothing here adds execution
  * machinery, which is the point: the API is the port, the engine is
  * Spark.
  */
class GraftStream[T](val ds: Dataset[T]) {

  /** T1/T2 — filter(FilterFunction). */
  def filter(f: T => Boolean): GraftStream[T] =
    new GraftStream(ds.filter(f))

  /** T3/T4/T5 — map(MapFunction). */
  def map[U: Encoder](f: T => U): GraftStream[U] =
    new GraftStream(ds.map(f))

  /** T6/T7 — flatMap(FlatMapFunction). */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): GraftStream[U] =
    new GraftStream(ds.flatMap(f))

  /** M1 — union (FIFO merge, no dedup). */
  def union(other: GraftStream[T]): GraftStream[T] =
    new GraftStream(ds.union(other.ds))

  /** E1 — assignTimestampsAndWatermarks: derive the event-time column
    * from a µs epoch column and attach the bounded-out-of-orderness
    * watermark (reference Q/util/SensorTimeAssigner.java:33). The new
    * `eventTimeCol` rides along; typed verbs ignore it. */
  def assignTimestampsAndWatermarks(tsUsCol: String, delay: String,
                                    eventTimeCol: String = "ts")
                                   (implicit enc: Encoder[T]): GraftStream[T] =
    new GraftStream(ds
      .withColumn(eventTimeCol, timestamp_micros(col(tsUsCol)))
      .withWatermark(eventTimeCol, delay)
      .as[T])

  /** M5 — intervalJoin(other).between(lowerMs, upperMs), Flink's keyed
    * two-stream range join: emits (left, right) pairs with equal
    * `keyCol` and right.time ∈ [left.time + lowerMs, left.time +
    * upperMs] (lower typically negative). On streams both sides must
    * carry a watermark on `eventTimeCol` (assignTimestampsAndWatermarks),
    * which is what bounds the join state — see Pipelines.intervalJoin
    * for the state contract. The typed (T, U) pair output is the
    * ProcessJoinFunction input shape. */
  def intervalJoin[U](other: GraftStream[U], keyCol: String, eventTimeCol: String,
                      lowerMs: Long, upperMs: Long): GraftStream[(T, U)] = {
    val l = ds; val r = other.ds
    new GraftStream(l.joinWith(r,
      l(keyCol) === r(keyCol) &&
        r(eventTimeCol) >= l(eventTimeCol) + expr(s"INTERVAL $lowerMs MILLISECONDS") &&
        r(eventTimeCol) <= l(eventTimeCol) + expr(s"INTERVAL $upperMs MILLISECONDS")))
  }

  /** A1 — keyBy(KeySelector). */
  def keyBy[K: Encoder](f: T => K): KeyedGraftStream[K, T] =
    new KeyedGraftStream(ds.groupByKey(f))

  /** K1 — print(): console sink for a live stream, show() for a batch.
    * Pass a checkpoint dir for a resumable console query; the default is a
    * throwaway temp dir (debug usage — it is NOT cleaned up or reused). */
  def print(intervalMs: Long = 1000L, checkpointLocation: Option[String] = None): Option[StreamingQuery] =
    if (ds.isStreaming)
      Some(ds.writeStream.format("console")
        .outputMode("append")
        .option("truncate", "false")
        .option("checkpointLocation", checkpointLocation.getOrElse(
          java.nio.file.Files.createTempDirectory("graft_print_ckpt").toString))
        .trigger(Trigger.ProcessingTime(s"$intervalMs milliseconds"))
        .start())
    else { ds.show(truncate = false); None }

  /** K5 — addSink(RichSinkFunction) ≈ ForeachWriter. */
  def addSink(writer: ForeachWriter[T]): DataStreamWriter[T] =
    ds.writeStream.foreach(writer)
}

/** Keyed stream — the target of keyBy (SURVEY.md §1.3: KeyedStream ↦
  * KeyValueGroupedDataset). */
class KeyedGraftStream[K, T](val kv: KeyValueGroupedDataset[K, T]) {

  /** A2/A3/A4 — rolling reduce with per-event emission, the exact
    * Update-mode semantics of the reference's `keyBy(..).reduce(..)`
    * (Q/KeyedTransformations.java:55-62: every input event emits the new
    * per-key aggregate). State = one T per key, engine-checkpointed. */
  def reduce(f: (T, T) => T)(implicit enc: Encoder[T]): GraftStream[T] =
    new GraftStream(kv.transformWithState(
      new GraftStream.ReduceProcessor[K, T](f, enc), TimeMode.None(), OutputMode.Update()))

  /** F1 — the ProcessFunction escape hatch. */
  def process[O: Encoder](p: StatefulProcessor[K, T, O],
                          timeMode: TimeMode = TimeMode.None(),
                          mode: OutputMode = OutputMode.Update()): GraftStream[O] =
    new GraftStream(kv.transformWithState(p, timeMode, mode))
}

object GraftStream {

  /** S3 — env.fromElements: bounded literal source. */
  def fromElements[T: Encoder](spark: SparkSession, elems: T*): GraftStream[T] =
    new GraftStream(spark.createDataset(elems))

  /** Lift any Dataset (batch or streaming) into the fluent surface. */
  def from[T](ds: Dataset[T]): GraftStream[T] = new GraftStream(ds)

  /** Generic rolling-reduce processor backing KeyedGraftStream.reduce. */
  private[api] class ReduceProcessor[K, T](f: (T, T) => T, enc: Encoder[T])
      extends StatefulProcessor[K, T, T] {
    @transient private var acc: ValueState[T] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[T]("acc", enc, TTLConfig.NONE)
    override def handleInputRows(key: K, rows: Iterator[T],
                                 tv: TimerValues): Iterator[T] = {
      val out = Seq.newBuilder[T]
      var cur: Option[T] = if (acc.exists) Some(acc.get) else None
      rows.foreach { r =>
        cur = Some(cur.fold(r)(f(_, r)))
        out += cur.get
      }
      cur.foreach(acc.update)
      out.result().iterator
    }
  }
}

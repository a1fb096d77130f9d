package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation functions.
  *
  * `SumCountAvg` reproduces the reference's AggregateFunction<IN,ACC,OUT>
  * contract (reference 정리/4주차.md:201-226: createAccumulator/add/getResult/
  * merge) as its exact Spark analog `Aggregator[IN, BUF, OUT]`
  * (zero/reduce/merge/finish). Catalyst plans this with partial aggregation
  * before the shuffle, the same partial+final split Flink gives
  * AggregateFunction — so it scales like a built-in avg.
  */
object SumCountAvg extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + a, b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): Double = if (r._2 == 0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

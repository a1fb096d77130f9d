package graft.operators

import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Dataset, Encoder}

/** F13 — async external I/O (the reference's AsyncFunction,
  * 정리/6주차.md:403-418): enrich records with concurrent calls to an
  * external service without stalling the stream on each round-trip.
  *
  * Spark has no async operator; the idiomatic rendering is mapPartitions
  * with a bounded in-flight window per partition. `orderedAsyncMap`
  * preserves input order within the partition (the reference's ordered
  * mode — results are emitted in arrival order even if they complete out
  * of order); the unordered mode of the reference degenerates to the same
  * thing here because a partition iterator is consumed sequentially, which
  * is also why the watermark-safety caveat disappears: batch boundaries
  * already fence event time.
  */
object AsyncMap {

  /** Map `f` over `ds` with up to `maxInFlight` concurrent calls per
    * partition, preserving order. `f` runs on `ec` (callers bring their
    * own pool sized to the external service). */
  def orderedAsyncMap[I, O: Encoder](ds: Dataset[I], maxInFlight: Int, timeout: Duration)
                                    (f: I => Future[O])
                                    (implicit ecf: () => ExecutionContext): Dataset[O] =
    ds.mapPartitions { rows =>
      implicit val ec: ExecutionContext = ecf()
      new Iterator[O] {
        private val inFlight = mutable.Queue.empty[Future[O]]
        private def fill(): Unit =
          while (inFlight.size < maxInFlight && rows.hasNext) inFlight.enqueue(f(rows.next()))
        override def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        override def next(): O = { fill(); Await.result(inFlight.dequeue(), timeout) }
      }
    }
}

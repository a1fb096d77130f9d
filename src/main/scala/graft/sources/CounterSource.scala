package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** S6 — custom checkpointable DataSource V2 source: the monotonic counter
  * whose read position survives failure (reference 정리/6주차.md:169-243,
  * CountSource + CheckpointedFunction: emit 1,2,3,… and snapshot the
  * current count so recovery resumes instead of restarting).
  *
  * Spark rendering: a MicroBatchStream whose Offset IS the count. The
  * engine persists offsets in the checkpoint WAL per epoch — exactly the
  * role the reference's checkpoint lock + snapshotState played, with
  * replay handled by planInputPartitions(start, end) being deterministic
  * for any offset range (the reference source cannot replay; this one
  * can, which upgrades it from at-most-once to exactly-once under the K8
  * consistency matrix).
  *
  * Usage: spark.readStream.format("graft.sources.CounterSource")
  *          .option("rowsPerBatch", "1000").load()  → schema (n BIGINT)
  */
class CounterSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CounterSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new CounterTable(
      opts.getLong("rowsPerBatch", 1000L),
      opts.getLong("maxRows", Long.MaxValue))
  }
}

object CounterSource {
  val SCHEMA: StructType = StructType(Seq(StructField("n", LongType, nullable = false)))
}

private class CounterTable(rowsPerBatch: Long, maxRows: Long) extends Table with SupportsRead {
  override def name(): String = s"counter(rowsPerBatch=$rowsPerBatch)"
  override def schema(): StructType = CounterSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CounterSource.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CounterMicroBatchStream(rowsPerBatch, maxRows)
    }
}

/** Offset = how many numbers have been emitted so far. */
private case class CountOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

private class CounterMicroBatchStream(rowsPerBatch: Long, maxRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  // Driver-side high-water mark: each trigger makes one more batch of
  // numbers available, up to maxRows (the reference source emitted
  // continuously; micro-batching quantizes that into per-trigger chunks,
  // and the cap makes the stream drainable for tests).
  //
  // SupportsAdmissionControl matters for recovery: after a restart this
  // object is fresh (available = 0), and the argless latestOffset() would
  // report an offset BELOW the checkpoint's committed start — rewinding
  // the WAL and re-emitting rows. The (start, limit) overload hands us the
  // restart position so the high-water mark resumes from it, which is
  // what "read position survives failure" means for a driver-side source.
  @volatile private var available: Long = 0L

  override def initialOffset(): Offset = CountOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CountOffset].count
    available = math.min(maxRows, math.max(available, from) + rowsPerBatch)
    CountOffset(available)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = CountOffset(json.toLong)
  override def commit(end: Offset): Unit = () // WAL-managed; nothing external

  /** Deterministic for any (start, end] range — the replayability the
    * reference's source lacked. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = end.asInstanceOf[CountOffset].count
    // Split the range across 4 partitions for parallel read.
    val step = math.max(1L, (e - s) / 4)
    (s until e by step).map(lo => CounterPartition(lo, math.min(lo + step, e)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CounterReaderFactory
  override def stop(): Unit = ()
}

private case class CounterPartition(from: Long, until: Long) extends InputPartition

private object CounterReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[CounterPartition]
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private var cur = p.from
      override def next(): Boolean = cur < p.until
      override def get(): org.apache.spark.sql.catalyst.InternalRow = {
        val row = org.apache.spark.sql.catalyst.InternalRow(cur + 1) // counts from 1
        cur += 1
        row
      }
      override def close(): Unit = ()
    }
  }
}

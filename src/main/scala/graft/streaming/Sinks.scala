package graft.streaming

import java.io.{BufferedWriter, File, FileWriter}

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.TxnFileSink

/** The sink family (SURVEY.md §2.2). K3 (streaming file sink) and K1
  * (console) are built-ins used from Pipelines/StreamingMain; this file
  * carries the custom ones: ForeachWriter (K5), WAL-idempotent foreachBatch
  * (K6), keyed-upsert (K4), and the late-data side-output demux (E8).
  */
object Sinks {

  /** K5 — per-record push sink with the open/process/close lifecycle of
    * the reference's RichSinkFunction socket sink (정리/6주차.md:245-274).
    * The reference pushes over TCP; with zero egress we push to a local
    * append-only file per (partition, epoch) — the lifecycle and per-record
    * `invoke` contract are what is being ported, not the wire. */
  class LineFileForeachWriter(dir: String) extends ForeachWriter[Row] {
    @transient private var out: BufferedWriter = _
    @transient private var path: File = _

    override def open(partitionId: Long, epochId: Long): Boolean = {
      new File(dir).mkdirs()
      path = new File(dir, s"part-$partitionId-epoch-$epochId.txt")
      out = new BufferedWriter(new FileWriter(path))
      true
    }
    override def process(row: Row): Unit = {
      out.write(row.mkString(","))
      out.newLine()
    }
    override def close(errorOrNull: Throwable): Unit = {
      if (out != null) out.close()
      // A failed epoch leaves a file that the replacement epoch overwrites
      // (same partition+epoch name) — at-least-once, as the reference's
      // socket sink is (정리/6주차.md:25-30 consistency matrix).
      if (errorOrNull != null && path != null) path.delete()
    }
  }

  /** K6/K7 — WAL-style exactly-once foreachBatch writer: Structured
    * Streaming replays an uncommitted epoch after failure with the SAME
    * batchId; TxnFileSink.commit is idempotent per batchId, so the replay
    * is a no-op — this is the reference's GenericWriteAheadSink contract
    * (정리/6주차.md:287-332: buffer per checkpoint, commit once, dedup by
    * checkpoint id) with the WAL role played by the checkpoint offset log. */
  def walBatchWriter(root: String): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => { TxnFileSink.commit(df, root, batchId); () }

  /** K4 — keyed-upsert sink: per batch, merge new rows into the keyed
    * table keeping the latest version per key (last-writer-wins on
    * `versionCol`), then atomically publish. Upserts are idempotent, so a
    * replayed batch converges to the same table — the reference's
    * Cassandra-sink exactly-once argument (정리/6주차.md:149-167).
    * The merge shuffles only on the key and rewrites one snapshot dir per
    * batch; at scale the same contract is what a Delta/Iceberg MERGE
    * provides, this helper is the dependency-free rendering. */
  def keyedUpsert(root: String, keyCol: String, versionCol: String)
                 (df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val current = currentVersionDir(spark, root)
    val base = current.map(d => spark.read.parquet(d)).getOrElse(df.limit(0))
    // Tag provenance so a (key, version) tie resolves deterministically to
    // the INCOMING row (upsert-wins) instead of whichever row the shuffle
    // happened to order first — replay then converges to the same table
    // even when a payload changed under an unchanged version.
    val merged = base.withColumn("__src", lit(0))
      .unionByName(df.withColumn("__src", lit(1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(versionCol).desc, col("__src").desc)
    val next = merged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "__src")
    TxnFileSink.commit(next, root, batchId)
  }

  /** Latest committed `batch=<id>` dir under a keyed-upsert root. */
  def currentVersionDir(spark: SparkSession, root: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.lastOption.map(id => s"$root/batch=$id")
  }

  /** E8 — side-output late data: Spark has no OutputTag, so the demux runs
    * in foreachBatch (SURVEY.md §2.6 E8): rows whose event time is below
    * (max event time seen so far − lateness) go to the `late` sink, the
    * rest to `main`. The high-water mark is computed from main batches
    * with id STRICTLY BELOW the current one — a replayed batch therefore
    * recomputes the identical cutoff even if its own main commit survived
    * the crash, so the split is deterministic under replay. Both writes
    * are TxnFileSink-committed — exactly-once on both outputs. */
  def lateDemux(mainRoot: String, lateRoot: String, tsCol: String, latenessMs: Long)
               (df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val prevMax: Option[Long] = highWaterBefore(spark, mainRoot, tsCol, batchId)
    val cutoff = prevMax.map(_ - latenessMs)
    val withFlag = cutoff match {
      case Some(c) => df.withColumn("__late", col(tsCol) < c)
      case None    => df.withColumn("__late", lit(false))
    }
    TxnFileSink.commit(withFlag.where(!col("__late")).drop("__late"), mainRoot, batchId)
    TxnFileSink.commit(withFlag.where(col("__late")).drop("__late"), lateRoot, batchId)
  }

  /** Max `tsCol` over committed `batch=<id>` dirs with id < `beforeBatch`. */
  private def highWaterBefore(spark: SparkSession, root: String, tsCol: String,
                              beforeBatch: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(_.getName.stripPrefix("batch=").toLong < beforeBatch)
      .map(_.toString)
    if (dirs.isEmpty) None
    else {
      val head = spark.read.parquet(dirs: _*).agg(max(col(tsCol))).head
      if (head.isNullAt(0)) None else Some(head.getLong(0))
    }
  }
}

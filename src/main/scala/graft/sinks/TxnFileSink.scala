package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Transactional (exactly-once) file sink helper.
  *
  * Reproduces the reference's TwoPhaseCommitSinkFunction temp-file →
  * atomic-move pattern (reference 정리/6주차.md:334-401) on top of Spark:
  * results for a batch are staged under a scratch directory
  * (beginTransaction/invoke/preCommit) and atomically renamed to their
  * final `batch=<id>` directory on commit. Commits are idempotent: if the
  * final directory already exists the batch was committed by a previous
  * attempt and the staging output is discarded — re-running the same
  * batchId never duplicates data. This is the same commit contract
  * Structured Streaming's file sink implements via its _spark_metadata
  * manifest; the helper makes it available to foreachBatch-style writers
  * (reference 정리/6주차.md:25-30 consistency matrix: replayable source +
  * transactional sink = exactly-once).
  */
object TxnFileSink {
  /** Write `df` for `batchId` under `root`, exactly once. Returns true if
    * this call performed the commit, false if the batch was already there. */
  def commit(df: DataFrame, root: String, batchId: Long): Boolean = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)
    val finalDir = new Path(rootPath, s"batch=$batchId")
    if (fs.exists(finalDir)) { // idempotent re-run: already committed
      sweepDebris(fs, rootPath, batchId)
      return false
    }
    // Each attempt stages under its own directory (beginTransaction):
    // concurrent committers must never share scratch space, or a losing
    // attempt's cleanup would delete the winner's in-flight files.
    val staging = new Path(rootPath,
      s"_staging_${batchId}_${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(staging.toString)
    fs.mkdirs(rootPath)
    // Atomic publish. If a concurrent committer won the race, drop ours.
    // Two filesystem contracts to handle: HDFS-style rename fails when the
    // destination exists (the !rename branch); POSIX-style rename "onto" an
    // existing directory succeeds but moves the source INSIDE it (the
    // nested-dir check).
    if (!fs.rename(staging, finalDir)) {
      if (!fs.exists(finalDir)) sys.error(s"TxnFileSink: commit of $finalDir failed")
      fs.delete(staging, true)
      return false
    }
    val nested = new Path(finalDir, staging.getName)
    if (fs.exists(nested)) { fs.delete(nested, true); return false } // lost the race
    sweepDebris(fs, rootPath, batchId)
    true
  }

  /** Remove staging dirs abandoned by crashed attempts of `batchId`.
    * Per-attempt staging names mean a dead attempt's scratch is never
    * reused, so it must be swept here — but only debris older than an
    * hour: a younger sibling may be a live concurrent attempt mid-write,
    * and deleting under it would fail its tasks. */
  private def sweepDebris(fs: org.apache.hadoop.fs.FileSystem, root: Path,
                          batchId: Long): Unit = {
    val prefix = s"_staging_${batchId}_"
    val cutoff = System.currentTimeMillis() - 3600_000L
    if (fs.exists(root))
      fs.listStatus(root)
        .filter(s => s.getPath.getName.startsWith(prefix) && s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Remove all committed batches under `root` (test helper). */
  def clear(spark: org.apache.spark.sql.SparkSession, root: String): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}

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
    if (fs.exists(finalDir)) return false // idempotent re-run: already committed
    val staging = new Path(rootPath, s"_staging_$batchId")
    fs.delete(staging, true) // clear debris from a failed previous attempt
    df.write.mode("overwrite").parquet(staging.toString)
    fs.mkdirs(rootPath)
    // Atomic publish. If a concurrent committer won the race, drop ours.
    if (!fs.rename(staging, finalDir)) {
      if (!fs.exists(finalDir)) sys.error(s"TxnFileSink: commit of $finalDir failed")
      fs.delete(staging, true)
      return false
    }
    true
  }

  /** Remove all committed batches under `root` (test helper). */
  def clear(spark: org.apache.spark.sql.SparkSession, root: String): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}

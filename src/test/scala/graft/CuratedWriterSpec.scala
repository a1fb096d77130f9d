package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.queries.ExtQueries
import graft.sinks.CuratedWriter

/** [[CuratedWriter]] — output layout as a contract: round-trip fidelity,
  * per-language directories, the maxRecordsPerFile split, and the
  * property the layout exists FOR — a single-language read touches only
  * that language's partition. */
class CuratedWriterSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  test("partitioned write: round-trip, pruning, and file-size caps") {
    val curated = ExtQueries.qx22(spark, dir)
    val out = tmpDir("curated_out")
    CuratedWriter.writeCurated(curated, out, maxRecordsPerFile = 10L)

    // Round-trip fidelity (lang comes back from the partition dirs).
    val back = spark.read.parquet(out)
    val a = curated.select("lang", "doc_id", "n_tokens", "cum_tokens")
    val b = back.select("lang", "doc_id", "n_tokens", "cum_tokens")
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "write/read round-trip diverged")

    // Hive-style one-directory-per-language layout.
    val langs = curated.select("lang").distinct().collect().map(_.getString(0)).toSet
    val subdirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(subdirs == langs.map(l => s"lang=$l"), s"partition dirs $subdirs != languages $langs")

    // maxRecordsPerFile: a language with more than 10 admitted docs must
    // split into multiple files (and the corpus must exercise that).
    val perLang = curated.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = perLang.filter(_._2 > 10)
    assert(big.nonEmpty, "no language exceeds the file cap — test is vacuous")
    big.keys.foreach { l =>
      val files = new java.io.File(s"$out/lang=$l").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files > 1, s"lang=$l: ${perLang(l)} rows landed in one file despite the cap")
    }

    // Partition pruning: the lang predicate must become a PARTITION
    // filter on the scan (pruned at the file index, not filtered after a
    // full scan). inputFiles reflects the pre-pruning index, so the
    // plan's partitionFilters is the right witness; the row count pins
    // the behavior.
    val one = big.keys.head
    val pruned = spark.read.parquet(out).where(col("lang") === one)
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in pruned read"))
    assert(scan.partitionFilters.nonEmpty, "lang filter did not reach partition pruning")
    assert(pruned.count() == perLang(one))
  }
}

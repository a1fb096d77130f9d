package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. transformWithState requires the
  * RocksDB state store provider (F12 — the reference's RocksDB backend,
  * 정리/5주차.md:113-141, is the same config-selected choice here). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // testdata events.ts is parquet TIMESTAMP(NANOS) (see Tables).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    // Keep saveAsTable artifacts (bucketing tests) out of the repo tree.
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("WARN") }

  def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  def round9(d: Double): Double = math.rint(d * 1e9) / 1e9

  override protected def afterAll(): Unit = {
    // Session is shared across suites in one forked JVM; do not stop it.
    super.afterAll()
  }
}

package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sources.FileBus
import graft.sources.FileBus.Record
import graft.streaming.{Kafka, Sinks}

/** S4/K2 closure-by-proxy (r8 verdict #4): the reference's Kafka
  * consumer/producer semantics proven against the [[FileBus]] emulated
  * transport — partitioned offset logs behind the same DSv2 seam as
  * the real connector. What KafkaSpec could only assert as option maps
  * (start positions, 정리/6주차.md:49-54) runs LIVE here: earliest /
  * latest / explicit per-partition map (the
  * [[Kafka.perPartitionOffsets]] JSON, -2/-1 sentinels included) /
  * timestamp, plus the K8 matrix row that makes the bus worth having —
  * kill/restart against one checkpoint with a WAL sink = exactly-once
  * end to end, and a committed producer epoch replays as a no-op. */
class FileBusSpec extends SparkTestBase {

  private def busDF(root: String, topic: String, starting: String = "earliest",
                    tsOpt: Option[Long] = None) = {
    val r = spark.readStream.format("graft.sources.FileBus")
      .option("path", root).option("subscribe", topic)
      .option("startingOffsets", starting)
    tsOpt.fold(r)(t => r.option("startingTimestamp", t.toString)).load()
  }

  private def seed(root: String, topic: String): Unit = {
    // p0: offsets 0..4 at ts 100..104; p1: offsets 0..2 at ts 200..202
    FileBus.append(root, topic, 0,
      (0 until 5).map(i => Record(s"k$i", s"p0v$i", 100L + i)))
    FileBus.append(root, topic, 1,
      (0 until 3).map(i => Record(null, s"p1v$i", 200L + i)))
  }

  test("earliest replays the whole log once, with offsets and null keys intact") {
    val root = tmpDir("bus_e")
    seed(root, "t")
    val q = busDF(root, "t").writeStream.format("memory")
      .queryName("bus_all").option("checkpointLocation", tmpDir("bus_e_ck")).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("bus_all")
      .select("partition", "offset", "key", "value", "timestamp").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    val expect =
      (0 until 5).map(i => (0, i.toLong, s"k$i", s"p0v$i", 100L + i)).toSet ++
      (0 until 3).map(i => (1, i.toLong, null: String, s"p1v$i", 200L + i)).toSet
    assert(rows == expect, s"diff=${(rows -- expect) ++ (expect -- rows)}")
  }

  test("maxOffsetsPerTrigger bounds each batch; coverage gapless and exactly-once across restart") {
    val root = tmpDir("bus_adm"); val topic = "t"
    FileBus.append(root, topic, 0, (0 until 40).map(i => Record(s"a$i", s"p0v$i", 100L + i)))
    FileBus.append(root, topic, 1, (0 until 20).map(i => Record(s"b$i", s"p1v$i", 200L + i)))
    val ck = tmpDir("bus_adm_ck")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Int, Long)])]
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.FileBus")
        .option("path", root).option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "10")
        .load()
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val rows = b.select("partition", "offset").collect()
              .map(r => (r.getInt(0), r.getLong(1))).toSeq
            seen.synchronized { seen += id -> rows }
            ()
        }.option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // a second producer epoch, then resume from the same checkpoint
    FileBus.append(root, topic, 0, (40 until 55).map(i => Record(s"a$i", s"p0v$i", 140L + i)))
    run()

    val all = seen.flatMap(_._2)
    assert(all.size == all.toSet.size, "an offset was read twice")
    assert(all.toSet ==
      ((0 until 55).map(i => (0, i.toLong)) ++ (0 until 20).map(i => (1, i.toLong))).toSet,
      "an offset was skipped")
    val sizes = seen.map(_._2.size)
    assert(sizes.forall(_ <= 10), s"a batch exceeded the cap: $sizes")
    assert(sizes.count(_ == 10) >= 5, s"the cap never bound: $sizes")
    // Proportional-to-lag split while both partitions lag: 40:20 lag at
    // cap 10 → floor 6/3, remainder to the smaller partition id → 7/3.
    val b0 = seen.head._2
    assert(b0.count(_._1 == 0) == 7 && b0.count(_._1 == 1) == 3,
      s"first batch split ${b0.groupBy(_._1).view.mapValues(_.size).toMap}, want 0→7, 1→3")
  }

  test("explicit per-partition start: the Kafka JSON form with -2/-1 sentinels") {
    val root = tmpDir("bus_x")
    seed(root, "t")
    // p0 from offset 3; p1 from latest (nothing until new data arrives)
    val starting = Kafka.perPartitionOffsets(Map(("t", 0) -> 3L, ("t", 1) -> -1L))
    val q = busDF(root, "t", starting).writeStream.format("memory")
      .queryName("bus_part").option("checkpointLocation", tmpDir("bus_x_ck")).start()
    try {
      q.processAllAvailable()
      // new p1 records arrive AFTER start — latest means "from here on"
      FileBus.append(root, "t", 1, Seq(Record("nk", "p1new", 300L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("bus_part").select("partition", "offset", "value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((0, 3L, "p0v3"), (0, 4L, "p0v4"), (1, 3L, "p1new")),
      s"got $rows")
  }

  test("timestamp start position: first offset with ts >= T per partition") {
    val root = tmpDir("bus_t")
    seed(root, "t")
    // T=103: p0 starts at offset 3 (ts 103); p1 wholly >= T ⇒ offset 0
    val q = busDF(root, "t", "earliest", tsOpt = Some(103L))
      .writeStream.format("memory").queryName("bus_ts")
      .option("checkpointLocation", tmpDir("bus_t_ck")).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("bus_ts").select("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(rows == Set((0, 3L), (0, 4L), (1, 0L), (1, 1L), (1, 2L)), s"got $rows")
  }

  test("kill/restart from one checkpoint: resume-from-offset x WAL sink = exactly-once") {
    val root = tmpDir("bus_r")
    val outRoot = s"${tmpDir("bus_r_out")}/wal"
    val ckpt = tmpDir("bus_r_ck")
    seed(root, "t")

    def startQuery() = busDF(root, "t")
      .select("partition", "offset", "value")
      .writeStream.foreachBatch(Sinks.walBatchWriter(outRoot))
      .option("checkpointLocation", ckpt).start()

    // Run 1: consume the seed, then die.
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    // Between runs the producer keeps appending.
    FileBus.append(root, "t", 0, Seq(Record("a", "late0", 500L)))
    FileBus.append(root, "t", 1, Seq(Record("b", "late1", 501L)))
    // Run 2: SAME checkpoint — must resume at the committed offsets.
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    // Run 3: idle restart commits nothing new.
    val after2 = new File(outRoot).listFiles().map(_.getName).toSet
    val q3 = startQuery()
    q3.processAllAvailable(); q3.stop()
    assert(new File(outRoot).listFiles().map(_.getName).toSet == after2,
      "idle restart committed a batch")

    val replayed = spark.read.parquet(s"$outRoot/batch=*")
    assert(replayed.count() == 10L, "loss or duplication across restarts")
    assert(replayed.select("partition", "offset").distinct().count() == 10L,
      "duplicated (partition, offset)")
    val late = replayed.where(col("value").startsWith("late")).count()
    assert(late == 2L, s"between-runs appends lost: $late")
  }

  test("producer epochs are batchId-idempotent; keyed routing is stable") {
    val root = tmpDir("bus_p")
    import spark.implicits._
    val batch = Seq(("x", "v1", 10L), ("y", "v2", 11L), ("x", "v3", 12L))
      .toDF("key", "value", "timestamp")
    FileBus.producerSink(root, "t", 2)(batch, 7L)
    val end0 = FileBus.endOffset(root, "t", 0)
    val end1 = FileBus.endOffset(root, "t", 1)
    assert(end0 + end1 == 3L, s"expected 3 records total, got ${end0 + end1}")
    // same key -> same partition (the default-partitioner shape)
    val xParts = (0 to 1).flatMap(p =>
      FileBus.read(root, "t", p, 0, 100).filter(_._3 == "x").map(_ => p)).distinct
    assert(xParts.size == 1, s"key 'x' split across partitions $xParts")
    // replaying the SAME epoch is a committed no-op
    FileBus.producerSink(root, "t", 2)(batch, 7L)
    assert(FileBus.endOffset(root, "t", 0) == end0 &&
           FileBus.endOffset(root, "t", 1) == end1,
      "re-delivered batchId appended again")
    // the NEXT epoch appends
    FileBus.producerSink(root, "t", 2)(batch.limit(1), 8L)
    assert(FileBus.endOffset(root, "t", 0) + FileBus.endOffset(root, "t", 1) == 4L)
  }
}

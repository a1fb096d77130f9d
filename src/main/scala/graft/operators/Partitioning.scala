package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** P1–P6 — the reference's physical redistribution surface
  * (정리/3주차.md:86-108) as thin, typed wrappers over Spark's exchange
  * operators. These exist so a user of the reference's API finds the same
  * verbs; the mapping is the SURVEY.md §2.8 table.
  *
  * On a 1000-executor cluster each of these is exactly one Exchange node:
  * round-robin (shuffle/rebalance), narrow coalesce (rescale), broadcast
  * replication, single-partition funnel (global — use knowingly!), or
  * hash/range/custom key partitioning (partitionCustom).
  */
object Partitioning {

  /** P1 — shuffle(): uniform random redistribution across n partitions. */
  def shuffle(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** P2 — rebalance(): round-robin over all downstream tasks (same
    * exchange as P1 in Spark: RoundRobinPartitioning). */
  def rebalance(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** P3 — rescale(): narrow redistribution to a local subset of tasks —
    * no shuffle, partitions are merged executor-locally. coalesce can only
    * merge downward; a target ABOVE the current partition count falls back
    * to a round-robin shuffle (Flink's rescale redistributes both ways; a
    * silent no-op would hand the caller 4× less parallelism than asked).
    *
    * Batch-only: the partition-count probe needs a materialized physical
    * plan, which a streaming frame does not have before execution (its
    * micro-batch plans are per-trigger). Streaming redistribution is P1/P6
    * (repartition works on streams). The probe uses queryExecution.toRdd —
    * the internal-row RDD, no deserializing wrapper, no job launched. */
  def rescale(df: DataFrame, n: Int): DataFrame = {
    require(!df.isStreaming,
      "rescale is batch-only (streaming frames have no pre-execution " +
        "partition count); use shuffle/partitionCustom on streams")
    if (n > df.queryExecution.toRdd.getNumPartitions) df.repartition(n) else df.coalesce(n)
  }

  /** P4 — broadcast(): replicate every record to all tasks (as a join-side
    * hint — Spark broadcasts relations, not streams). */
  def broadcastAll(df: DataFrame): DataFrame = broadcast(df)

  /** P5 — global(): send everything to one task. The reference warns this
    * serializes the stream; same caveat at 100 TB — diagnostics only. */
  def global(df: DataFrame): DataFrame = df.repartition(1)

  /** P6 — partitionCustom(partitioner, field): user-controlled key
    * placement. Hash flavor. */
  def partitionCustom(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartition(n, keys: _*)

  /** P6 range flavor — co-locate key ranges (the building block q12's
    * two-phase prefix scan relies on). */
  def partitionByRange(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartitionByRange(n, keys: _*)

  /** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
    * 1998: item → argmax over shards of hash(item, shard). Unlike the
    * mod-N placement `partitionCustom` gives you, growing N → N+1 moves
    * ONLY the items the new shard wins (an expected 1/(N+1) fraction),
    * and every mover lands on the new shard — the property that makes
    * standing shard maps (ANN index cells, per-shard dedup state,
    * sticky caches) survive a resize without a full reshuffle.
    *
    * Determinism across engines: per-shard weight is the squared-affine
    * hash ((id·1000003 + s·97 + 7) mod p)² mod p (the LSH-family mix),
    * and the argmax is spelled max(weight·16 + s) mod 16 — a single
    * integer max whose low bits carry the winner, so there is no
    * tie-break ambiguity anywhere (n ≤ 16; weights stay < 2³⁵).
    *
    * Scale shape: pure scan-local codegen'd expression — no shuffle, no
    * state; the column then FEEDS `partitionCustom` (one exchange) when
    * materializing placement. */
  def rendezvousShard(idCol: String, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 16, "1..16 shards (4 winner bits)")
    val h1 = s"(($idCol * 1000003 + s * 97 + 7) % 2147483647)"
    org.apache.spark.sql.functions.expr(
      s"array_max(transform(sequence(0, ${nShards - 1}), " +
        s"s -> ($h1 * $h1 % 2147483647) * 16 + s)) % 16")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mixture-schedule materialization — the step AFTER
  * budget allocation ([[UniMax]]/qx88): turn per-language token
  * allocations into the actual interleaved TRAINING ORDER. Token j of
  * language l takes virtual deadline d = (j·B div alloc_l)·L + idx_l
  * (stride scheduling / virtual-time EDF — Waldspurger & Weihl, OSDI
  * 1994; the idx_l term makes every deadline globally unique), and the
  * schedule is the deadlines in ascending order: language l's tokens
  * land ~B/alloc_l apart, the smoothest possible interleave, fully
  * reproducible from (alloc table, j) alone — the qx83 property lifted
  * from shuffling to MIXING.
  *
  * The scale point is HOW position is computed: NOT by sorting — a
  * global row_number over B rows is the single-partition-window trap —
  * but by the closed form
  *
  *   pos(l, j) = Σ_{l'} #{j' ≤ alloc_{l'} : d(l', j') ≤ d(l, j)}
  *             = Σ_{l'} clamp(((q_{l'}+1)·alloc_{l'} − 1) div B, 0, alloc_{l'}),
  *   q_{l'}   = (d − idx_{l'}) div L   (−1 ⇒ 0 tokens),
  *
  * evaluated per row against the BROADCAST language table folded into
  * one array column — scan-local, zero exchanges for the schedule
  * itself: any worker materializes any slice of the training order
  * independently, which is exactly what a 1000-executor data loader
  * needs. The ORACLE ranks the same deadlines with a window sort — an
  * INDEPENDENT formulation, so the gate cross-validates the closed
  * form against the definition instead of replaying it.
  *
  * Integer bounds: d ≤ (B+1)·L and the count term multiplies
  * (q+1)·alloc ≤ ~B² — fine in BIGINT to ~10⁹-token budgets; a
  * trillion-token run lifts that one product to DECIMAL(38) (the
  * documented 128-bit step), everything else stays 64-bit. */
object MixSchedule {

  /** alloc(lang, alloc) → one row per scheduled token: (lang, j, d,
    * pos), pos ∈ [1, B] a bijection. Schedule rows generate from a
    * parallel `range` × broadcast language table (never a driver-side
    * sequence), and pos is the closed form above. */
  def schedule(alloc: DataFrame): DataFrame = {
    val spark = alloc.sparkSession
    // Languages-bounded (≤ hundreds of rows) and referenced FOUR times
    // below (the max-alloc read, both broadcasts, and langArr) — pinned,
    // so the caller's allocation chain (in qx116: the LPA-labels join
    // plus the per-community token scan) runs once, not per reference
    // (round 17, guide §5).
    val langs = alloc.where(col("alloc") > 0L)
      .withColumn("idx", row_number().over(Window.orderBy("lang")).cast("long") - 1L)
      .withColumn("nlang", count(lit(1)).over(Window.partitionBy()))
      .withColumn("btot", sum("alloc").over(Window.partitionBy()))
      .localCheckpoint()
    // One-row broadcast of the whole language table as an array column:
    // the schedule expression folds over it scan-locally.
    val langArr = langs.groupBy()
      .agg(collect_list(struct(col("idx"), col("alloc"))).as("la"),
        max("nlang").as("ll"), max("btot").as("bb"))
    // Langs-bounded driver read; max over zero rows is SQL NULL, so a
    // degenerate alloc table (empty, or every alloc <= 0) yields the
    // empty schedule rather than an NPE.
    val maxRow = langs.agg(max("alloc")).head
    if (maxRow.isNullAt(0))
      return spark.range(0).select(lit("").as("lang"), col("id").as("j"),
        col("id").as("d"), col("id").as("pos"),
        col("id").as("gap"))
    val maxAlloc = maxRow.getLong(0)
    // pos — and therefore the previous token's pos, and the GAP between
    // them — is a pure closed form of (lang, j, language table), so the
    // gap rides the same scan-local projection: evaluate the fold at
    // d(j) and at d(j−1), subtract (round 18, guide §2.1 — the audit's
    // lag window was the one place the B-row schedule got exchanged AND
    // sorted per language; B is corpus-token-sized, so at 100 TB that
    // window was the schedule family's only corpus-scale sort. NULL at
    // j = 1 replicates lag()'s first-row semantics exactly).
    val POS_AT = (dcol: String) =>
      s"""aggregate(la, 0L, (acc, a) ->
         |  acc + CASE WHEN $dcol < a.idx THEN 0L
         |             ELSE least(a.alloc, greatest(0L,
         |               ((($dcol - a.idx) div ll + 1) * a.alloc - 1) div bb))
         |        END)""".stripMargin
    spark.range(1, maxAlloc + 1).toDF("j")
      .join(broadcast(langs.select("lang", "idx", "alloc")), col("j") <= col("alloc"))
      .join(broadcast(langArr))
      .withColumn("d", expr("(j * bb div alloc) * ll + idx"))
      .withColumn("dprev", expr("((j - 1) * bb div alloc) * ll + idx"))
      .withColumn("pos", expr(POS_AT("d")))
      .withColumn("gap",
        when(col("j") === 1L, lit(null).cast("long"))
          .otherwise(col("pos") - expr(POS_AT("dprev"))))
      .select(col("lang"), col("j"), col("d"), col("pos"), col("gap"))
  }

  /** Per-language schedule audit: slot count, extremes, Σ pos (pins the
    * full position multiset together with max/min gap — stride
    * scheduling's smoothness guarantee made measurable). The gap column
    * arrives scan-local from [[schedule]]'s closed form (it equals
    * pos − lag(pos) over (lang, j) — MixScheduleSpec pins that — so the
    * audit is one map-side-combinable aggregate, no corpus-scale window
    * sort). */
  def audit(sched: DataFrame): DataFrame =
    sched
      .groupBy("lang")
      .agg(count(lit(1)).as("n_slots"),
        min("pos").as("first_pos"), max("pos").as("last_pos"),
        sum("pos").as("sum_pos"),
        max("gap").as("max_gap"), min("gap").as("min_gap"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time as-of join against a SMALL right side.
  *
  * This is the deterministic Spark rendering of the reference's
  * broadcast-control-stream pattern (reference
  * Q/MultiStreamTransformations.java:62-69: a low-rate SmokeLevel stream is
  * broadcast to every task and each sensor event sees the latest smoke
  * level). Flink's arrival interleaving is nondeterministic
  * (정리/3주차.md:79-81); we determinize as "the control row with the
  * greatest timestamp at-or-before the event's timestamp".
  *
  * Implementation: turn the control rows into half-open validity intervals
  * [ts, next_ts) with a lead() window (single-partition, but only over the
  * control side — which by construction is tiny: the reference emits 1
  * control event/second), then broadcast the intervals and range-join.
  * Each event matches exactly one interval, so no post-dedup is needed.
  * At 100 TB the left side streams through executors unshuffled; the only
  * requirement is that the control table fits in a broadcast, exactly the
  * assumption Flink's broadcast state makes.
  */
object AsOfJoin {
  /** Hard ceiling on control-side rows: the lead() window and the
    * broadcast both assume a small control stream (the reference emits
    * 1/s). Exceeding it should be a loud plan-time error, not a driver
    * OOM at broadcast time on a 100 TB run. */
  val MaxControlRows: Long = 5_000_000L

  /** @param events   big side, must carry `tsCol`
    * @param control  small side, must carry `tsCol`; all its columns are kept
    * @param tsCol    integer epoch column name present on both sides
    * @param maxControlRows broadcast-safety ceiling (see [[MaxControlRows]])
    */
  def latestAtOrBefore(events: DataFrame, control: DataFrame, tsCol: String,
                       maxControlRows: Long = MaxControlRows): DataFrame = {
    // limit(max+1) bounds the guard's scan: we only need to know whether
    // the ceiling is exceeded, not the true count.
    val controlRows = control.limit(math.min(maxControlRows + 1, Int.MaxValue.toLong - 1).toInt).count()
    require(controlRows <= maxControlRows,
      s"AsOfJoin: control side exceeds $maxControlRows rows. " +
        "This operator broadcasts the control stream; a control side this " +
        "large needs a shuffled range join instead.")
    // Duplicate control timestamps would produce empty [ts, ts) intervals
    // with a nondeterministic survivor; collapse them deterministically by
    // keeping the struct-max of the remaining columns per timestamp.
    val others = control.columns.filter(_ != tsCol)
    val deduped = control
      .groupBy(col(tsCol))
      .agg(max(struct(others.map(col): _*)).as("__s"))
      .select(col(tsCol) +: others.map(n => col(s"__s.$n").as(n)): _*)
    val ctrl = deduped
      .withColumnRenamed(tsCol, "__ctrl_ts")
      .withColumn("__ctrl_next", lead(col("__ctrl_ts"), 1).over(Window.orderBy(col("__ctrl_ts"))))
    events.join(
      broadcast(ctrl),
      col(tsCol) >= col("__ctrl_ts") &&
        (col("__ctrl_next").isNull || col(tsCol) < col("__ctrl_next")))
      .drop("__ctrl_ts", "__ctrl_next")
  }
}

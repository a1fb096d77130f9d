package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming HyperLogLog — the ONLINE qx73, and the sketch family's
  * sharpest replay story: because a register only ever takes the MAX of
  * what it has seen, the sketch is IDEMPOTENT and ORDER-INSENSITIVE by
  * construction. Every other counting processor here needs the cursor
  * discipline (CmsStream, HeavyHittersStream: re-delivered rows would
  * double-count); HLL needs NOTHING — any duplicate, any reordering,
  * any replay folds to the same 256 registers. That is why it is the
  * sketch every warehouse ships for streaming distinct counts.
  *
  * Key geometry is qx73's verbatim ([[keyOf]]/[[regOf]]/[[rhoOf]] —
  * the oracle-shared affine spelling), so HllStreamSpec pins the state
  * grid equal to the BATCH register grid cell for cell (statestore
  * read-back, the F11/CmsStream pattern) under splits, duplication AND
  * a shuffled feed — the assertion no cursor processor can make.
  * State: one 256-register vector per language, ~2 KB — forever, for
  * an unbounded vocabulary. Heartbeat emission; the grid lives in
  * state. */
object HllStream {

  val P = 8
  val M: Int = 1 << P

  /** One token observation (dedup NOT required upstream). */
  case class TokenObs(lang: String, wh: Long)

  case class HllHeartbeat(lang: String, n_obs: Long, n_nonempty: Long)

  private[streaming] case class Regs(regs: Seq[Long], nObs: Long)

  /** qx73's 55-bit key, verbatim. */
  def keyOf(wh: Long): Long =
    ((wh * 1000003L + 12345L) % 2147483647L) * 16777216L +
      ((wh * 69069L + 54321L) % 2147483647L) % 16777216L

  def regOf(k: Long): Int = (k % 256L).toInt

  def rhoOf(k: Long): Long = {
    val w = k / 256L
    if (w == 0L) 48L else 48L - java.lang.Long.toBinaryString(w).length
  }

  class HllProcessor extends StatefulProcessor[String, TokenObs, HllHeartbeat] {
    @transient private var st: ValueState[Regs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Regs]("hll", Encoders.product[Regs],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TokenObs],
                                 tv: TimerValues): Iterator[HllHeartbeat] = {
      val prev = if (st.exists) st.get() else Regs(Seq.fill(M)(0L), 0L)
      val regs = prev.regs.toArray
      var n = prev.nObs
      rows.foreach { r => // no sort, no cursor: max-fold is order-free
        val k = keyOf(r.wh)
        val i = regOf(k)
        val rho = rhoOf(k)
        if (rho > regs(i)) regs(i) = rho
        n += 1L
      }
      st.update(Regs(regs.toSeq, n))
      Iterator.single(HllHeartbeat(key, n, regs.count(_ > 0L).toLong))
    }
  }

  /** One keyed-state shuffle on lang → heartbeats; registers in state. */
  def registers(toks: Dataset[TokenObs]): Dataset[HllHeartbeat] = {
    implicit val outEnc = Encoders.product[HllHeartbeat]
    toks.groupByKey(_.lang)(Encoders.STRING)
      .transformWithState(new HllProcessor(), TimeMode.None(), OutputMode.Update())
  }
}

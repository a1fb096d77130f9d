package graft.functions

/** HyperLogLog estimation over the register grid qx73 materializes
  * (Flajolet, Fusy, Gandouet, Meunier 2007). The DISTRIBUTED part of
  * HLL is the register grid itself — a bounded, register-wise-max-
  * mergeable aggregate the gate pins hash-exact; the float estimate is
  * a driver-side formula over ≤ m rows, so it lives here (floats never
  * enter the oracle, the qx18 KMV discipline).
  *
  * `m` = 256 registers (p = 8): standard error ≈ 1.04/√m ≈ 6.5%.
  * The small-range correction (linear counting when the raw estimate
  * < 2.5·m and empty registers exist) is the published variant.
  */
object HllEstimate {

  val P: Int = 8
  val M: Int = 1 << P

  /** @param registers (registerValue → register count) for NON-EMPTY
    *                   registers, i.e. the qx73 histogram rows */
  def estimate(registers: Map[Int, Long]): Double = {
    val observed = registers.values.sum
    val empty = M - observed
    require(empty >= 0, s"more than $M registers")
    val alpha = 0.7213 / (1.0 + 1.079 / M) // alpha_m for m >= 128
    // empty registers contribute 2^0 each
    val z = empty.toDouble +
      registers.toSeq.sortBy(_._1).map { case (v, c) => c * math.pow(2.0, -v) }.sum
    val raw = alpha * M.toDouble * M.toDouble / z
    if (raw <= 2.5 * M && empty > 0) M * math.log(M.toDouble / empty) // linear counting
    else raw
  }

  /** Register-wise max over (registerIndex → value) grids — the merge
    * law that makes HLL a one-pass distributed aggregate: shard
    * sketches combine losslessly, in any order or grouping. */
  def mergeRegisters(a: Map[Int, Int], b: Map[Int, Int]): Map[Int, Int] =
    (a.keySet ++ b.keySet).iterator
      .map(i => i -> math.max(a.getOrElse(i, 0), b.getOrElse(i, 0))).toMap

  /** Registers grid → histogram rows (the qx73 output shape). */
  def toHistogram(regs: Map[Int, Int]): Map[Int, Long] =
    regs.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
}

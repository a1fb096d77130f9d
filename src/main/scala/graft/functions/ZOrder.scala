package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder2(a, b)` — the 2-dimensional Morton (Z-order) interleave as a
  * native codegen'd expression: bit i of `a` lands at output bit 2i+1 and
  * bit i of `b` at bit 2i, producing a 32-bit z-value whose ordering is
  * the space-filling Z-curve over the (a, b) grid.
  *
  * This is the multi-dimensional DATA-LAYOUT primitive (the operation
  * behind Delta/Iceberg-style `OPTIMIZE ZORDER BY`): sorting or
  * range-partitioning 100 TB of parquet by `zorder2(binA, binB)` makes
  * every output file cover a small RECTANGLE of the (a, b) space, so
  * file-level min/max statistics prune scans filtered on EITHER
  * dimension — a linear sort bounds only its leading column.
  * [[graft.operators.ZOrderLayout]] wraps the quantize → interleave →
  * range-partition pipeline; ZOrderSpec measures the locality claim.
  *
  * Inputs are 16-bit bin indices (the caller quantizes raw dimensions —
  * see [[graft.operators.ZOrderLayout.bin16]]); bits above the low 16 are
  * IGNORED (masked), so any Long bins safely, and the result is always in
  * [0, 2³²). NULL in → NULL out. The kernel is the branch-free mask-shift
  * spread (each doubling step spaces the bits apart), not a bit loop —
  * 10 shift/mask ops per side, whole-stage-codegen friendly.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType ||
      t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = left.nullable || right.nullable

  /** Space the low 16 bits of `v` to the even bit positions of a 32-bit
    * word: 0x0000abcd → 0a0b0c0d (each hex step halves the group size). */
  private def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    (spread16(a.asInstanceOf[Long]) << 1) | spread16(b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      def spread(x: String): String =
        s"""$x = ($x | ($x << 8)) & 0x00ff00ffL;
           |$x = ($x | ($x << 4)) & 0x0f0f0f0fL;
           |$x = ($x | ($x << 2)) & 0x33333333L;
           |$x = ($x | ($x << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $xa = $a & 0xffffL;
         |long $xb = $b & 0xffffL;
         |${spread(xa)}
         |${spread(xb)}
         |${ev.value} = ($xa << 1) | $xb;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

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

/** `zordern(d1, …, dk)` (k = 2..4) — the N-dimensional Morton weave
  * (round-8 verdict #8: a real layout optimizer clusters 3–4 dims, not
  * 2): bit j of dimension i lands at output bit `j·k + (k−1−i)`, so
  * the result orders rows along the k-dimensional Z-curve and a range
  * partition over it gives every output file a small HYPER-RECTANGLE
  * of the dim space — min/max pruning works on ANY of the k filter
  * columns. 16-bit bins per dim (bits above 16 masked), result < 2^(16k).
  *
  * Same branch-free mask-shift kernel as [[ZOrder2]], generalized: the
  * stride-3 spread uses the 21-bit libmorton constants (16 ≤ 21), the
  * stride-4 spread the byte→nibble→pair→bit split. Fully codegen'd;
  * NULL in → NULL out. `zordern(a, b)` ≡ `zorder2(a, b)` (spec-pinned),
  * so the 2-dim twin stays the canonical bit-shift oracle shape. */
case class ZOrderN(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zordern"
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType ||
      t == org.apache.spark.sql.types.NullType
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"zordern expects 2 to 4 arguments, got ${children.size}")
    else if (children.forall(c => ok(c.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zordern expects BIGINT arguments, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  private def spread(v: Long, k: Int): Long = {
    var x = v & 0xffffL
    k match {
      case 2 =>
        x = (x | (x << 8)) & 0x00ff00ffL
        x = (x | (x << 4)) & 0x0f0f0f0fL
        x = (x | (x << 2)) & 0x33333333L
        x = (x | (x << 1)) & 0x55555555L
      case 3 =>
        x = (x | (x << 32)) & 0x1f00000000ffffL
        x = (x | (x << 16)) & 0x1f0000ff0000ffL
        x = (x | (x << 8))  & 0x100f00f00f00f00fL
        x = (x | (x << 4))  & 0x10c30c30c30c30c3L
        x = (x | (x << 2))  & 0x1249249249249249L
      case _ =>
        x = (x | (x << 24)) & 0x000000ff000000ffL
        x = (x | (x << 12)) & 0x000f000f000f000fL
        x = (x | (x << 6))  & 0x0303030303030303L
        x = (x | (x << 3))  & 0x1111111111111111L
    }
    x
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = children.size
    var acc = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      acc |= spread(v.asInstanceOf[Long], k) << (k - 1 - i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    def spreadCode(x: String): String = k match {
      case 2 =>
        s"""$x = ($x | ($x << 8)) & 0x00ff00ffL;
           |$x = ($x | ($x << 4)) & 0x0f0f0f0fL;
           |$x = ($x | ($x << 2)) & 0x33333333L;
           |$x = ($x | ($x << 1)) & 0x55555555L;""".stripMargin
      case 3 =>
        s"""$x = ($x | ($x << 32)) & 0x1f00000000ffffL;
           |$x = ($x | ($x << 16)) & 0x1f0000ff0000ffL;
           |$x = ($x | ($x << 8))  & 0x100f00f00f00f00fL;
           |$x = ($x | ($x << 4))  & 0x10c30c30c30c30c3L;
           |$x = ($x | ($x << 2))  & 0x1249249249249249L;""".stripMargin
      case _ =>
        s"""$x = ($x | ($x << 24)) & 0x000000ff000000ffL;
           |$x = ($x | ($x << 12)) & 0x000f000f000f000fL;
           |$x = ($x | ($x << 6))  & 0x0303030303030303L;
           |$x = ($x | ($x << 3))  & 0x1111111111111111L;""".stripMargin
    }
    val evals = children.map(_.genCode(ctx))
    val xs = children.indices.map(i => ctx.freshName(s"zx$i"))
    val body = children.indices.map { i =>
      s"""${evals(i).code}
         |if (${evals(i).isNull}) { ${ev.isNull} = true; } else {
         |  long ${xs(i)} = ${evals(i).value} & 0xffffL;
         |  ${spreadCode(xs(i))}
         |  ${ev.value} |= ${xs(i)} << ${k - 1 - i};
         |}""".stripMargin
    }
    // first null wins: guard each step on not-yet-null
    val guarded = body.zipWithIndex.map { case (b, i) =>
      if (i == 0) b else s"if (!${ev.isNull}) {\n$b\n}"
    }.mkString("\n")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |${guarded}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

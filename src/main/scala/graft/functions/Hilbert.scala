package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `hilbert2(x, y)` — the order-16 Hilbert curve index as a native
  * codegen'd expression, the hot-path kernel behind
  * [[graft.operators.HilbertCurve]] (qx87).
  *
  * The staged-projection spelling of the same walk (16 chained CASE
  * projections — kept in `HilbertCurve.withHilbert` because the ORACLE
  * twin is generated from its per-stage builder) measured 4.2 s at
  * sf0.1 against zorder2's 0.29 s on the identical scan: sixteen
  * stages of tripled CASE trees blow the generated method past the JIT
  * limits the branch-free Z-order kernel never approaches. This
  * expression is the same per-plane rotation walk as ONE tight 16-step
  * loop — [[HilbertCurveSpec]] pins it equal to both the staged plan
  * and the Scala reference, and the gate hash pins it against the
  * generated-CTE oracle.
  *
  * Inputs are 16-bit bins (bits above 16 masked, the zorder2 contract);
  * result in [0, 2³²). NULL in → NULL out.
  */
case class Hilbert2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType ||
      t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2 expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hilbert2.index(a.asInstanceOf[Long] & 0xffffL, b.asInstanceOf[Long] & 0xffffL)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert2.index($a & 0xffffL, $b & 0xffffL);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert2 {
  /** The rotation walk (identical to HilbertCurve.xy2d at order 16),
    * called from both interpreted eval and generated code. */
  def index(xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

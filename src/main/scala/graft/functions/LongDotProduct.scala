package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `long_dot(a, b)` — exact integer dot product of two ARRAY<BIGINT>
  * columns, as a native Catalyst expression with code generation.
  *
  * The ANN queries score candidates with Σ aᵢ·bᵢ over integerized
  * embeddings. The declarative spelling —
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (s,v) -> s+v)` — allocates
  * an intermediate array and evaluates two interpreted lambdas per row;
  * this expression is one fused long loop inside whole-stage codegen
  * (brief preference order: native Expression > HOF chain > UDF for hot
  * paths). Null semantics match the HOF form: NULL if either side is
  * null, if the lengths differ (zip_with pads the shorter side with nulls,
  * poisoning the sum), or if any element is null. Overflow DIVERGES from
  * the HOF form under Spark 4's default ANSI mode: the aggregate/zip_with
  * chain throws ArithmeticException on Long overflow while long_dot wraps
  * silently (Java arithmetic) — so the equivalence holds only on the
  * quantized range callers maintain (|elem| ≤ ~2e6 ⇒ |term| ≤ 4e12,
  * |sum| ≤ 64·4e12 ≪ 2⁶³; LongDotProductSpec pins the in-range behavior).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal → null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Fresh names: this snippet may be inlined multiple times into one
      // generated method, so fixed local names would collide.
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `pq_adc(lut, codes)` — asymmetric-distance lookup sum for product
  * quantization, as a native codegen'd expression: with M = |codes| and
  * K = |lut| / M, returns Σ_m lut[m·K + codes[m]].
  *
  * This is qx42's per-(vector, query) kernel, evaluated n·q times in the
  * compressed-domain scan — the hot path of the suite by row count. The
  * declarative spelling (`aggregate(sequence(0, M−1), 0L, (a, m) →
  * a + element_at(lut, …))`) allocates the index sequence and evaluates
  * an interpreted lambda chain per pair; at the 100× probe that made the
  * ADC scan ~3× SLOWER than qx2's full-precision `long_dot` scan — the
  * opposite of what 8-adds-vs-64-mul-adds should cost. Same preference
  * order long_dot documents: native Expression > HOF chain > UDF.
  *
  * Null semantics: NULL if either side is NULL, any element is NULL, |lut|
  * does not divide into M equal banks, or a code indexes outside its bank
  * — the poisoned-row contract of the HOF form, without ANSI's
  * out-of-bounds error (a malformed code can't fail the scan). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (ARRAY<BIGINT> lut, ARRAY<BIGINT> codes), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val k = lut.numElements() / m
    var acc = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getLong(i)
      if (c < 0 || c >= k) return null
      val idx = i * k + c.toInt
      if (lut.isNullAt(idx)) return null
      acc += lut.getLong(idx)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.numElements();
         |if ($m == 0 || $a.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $a.numElements() / $m;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $c = $b.getLong($i);
         |    if ($c < 0 || $c >= $k) { ${ev.isNull} = true; break; }
         |    int $idx = $i * $k + (int) $c;
         |    if ($a.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($idx);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** `max_sim(q, d, t)` — ColBERT-style late-interaction MaxSim score
  * (Khattab & Zaharia, SIGIR 2020) between two integerized multi-vector
  * columns, as one fused codegen'd kernel.
  *
  * Both ARRAY<BIGINT> inputs are read as `t` contiguous sub-vectors
  * ("token embeddings") of length n/t. The score is
  *
  *   Σ_{i<t} max_{j<t} cos(q_i, d_j)
  *
  * with cos the repo's deterministic integer-cosine: exact Long dot and
  * exact Long sub-norms, ONE double division per (i,j) in a fixed
  * operation order — `(double)dot / (sqrt((double)qn2_i)·sqrt((double)dn2_j))`
  * — so a SQL oracle replays it bit-identically (quantized inputs keep
  * every integer below 2⁵³, where the double casts are exact). A
  * zero-norm sub-vector contributes cosine 0.0 (totality guard; cannot
  * occur for the quantized corpus). The outer sum accumulates in
  * ascending i — `((m₀+m₁)+m₂)+m₃` — matching the oracle's explicit
  * parenthesization; the inner max is comparison-based, order-exact.
  *
  * Null semantics follow [[LongDotProduct]]: NULL if either array is
  * null, lengths differ, any element is null, or n is not divisible by
  * t. `t` must be a foldable positive INT.
  *
  * Why an Expression and not slice()+long_dot composition: the
  * declarative spelling materializes 2·t² sliced arrays per scored pair;
  * this kernel is one allocation-free loop nest inside whole-stage
  * codegen (the PqAdc precedent — MaxSimSpec pins bit-equality against
  * the declarative form).
  */
case class MaxSim(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_sim"
  override def nullable: Boolean = true

  private lazy val t: Int = third.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (!ok(first.dataType) || !ok(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"max_sim expects (ARRAY<BIGINT>, ARRAY<BIGINT>, INT), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString})")
    else if (!third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("max_sim: t must be a foldable positive INT")
    else third.eval(InternalRow.empty) match {
      // null-guard: CAST(NULL AS INT) is foldable IntegerType but folds
      // to null — must fail the check, not NPE during analysis
      case n: Number if n.intValue() > 0 => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure("max_sim: t must be a foldable positive INT")
    }
  }

  override protected def nullSafeEval(qa: Any, da: Any, ta: Any): Any = {
    val q = qa.asInstanceOf[ArrayData]
    val d = da.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (n != d.numElements() || n % t != 0) return null
    var k = 0
    while (k < n) {
      if (q.isNullAt(k) || d.isNullAt(k)) return null
      k += 1
    }
    val sub = n / t
    // exact Long sub-norms, once per row pair
    val qn2 = new Array[Long](t)
    val dn2 = new Array[Long](t)
    var i = 0
    while (i < t) {
      var s1 = 0L; var s2 = 0L; var p = 0
      while (p < sub) {
        val x = q.getLong(i * sub + p); s1 += x * x
        val y = d.getLong(i * sub + p); s2 += y * y
        p += 1
      }
      qn2(i) = s1; dn2(i) = s2
      i += 1
    }
    var score = 0.0
    i = 0
    while (i < t) {
      var m = -java.lang.Double.MAX_VALUE
      var j = 0
      while (j < t) {
        var dot = 0L
        var p = 0
        while (p < sub) {
          dot += q.getLong(i * sub + p) * d.getLong(j * sub + p)
          p += 1
        }
        val c =
          if (qn2(i) == 0L || dn2(j) == 0L) 0.0
          else dot.toDouble / (math.sqrt(qn2(i).toDouble) * math.sqrt(dn2(j).toDouble))
        if (c > m) m = c
        j += 1
      }
      score += m
      i += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d, _) => {
      val n = ctx.freshName("n")
      val sub = ctx.freshName("sub")
      val qn2 = ctx.freshName("qn2")
      val dn2 = ctx.freshName("dn2")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val s1 = ctx.freshName("s1")
      val s2 = ctx.freshName("s2")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val score = ctx.freshName("score")
      s"""
         |int $n = $q.numElements();
         |if ($n != $d.numElements() || $n % $t != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $p = 0; $p < $n; $p++) {
         |    if ($q.isNullAt($p) || $d.isNullAt($p)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    int $sub = $n / $t;
         |    long[] $qn2 = new long[$t];
         |    long[] $dn2 = new long[$t];
         |    for (int $i = 0; $i < $t; $i++) {
         |      long $s1 = 0L; long $s2 = 0L;
         |      for (int $p = 0; $p < $sub; $p++) {
         |        long $x = $q.getLong($i * $sub + $p); $s1 += $x * $x;
         |        long $y = $d.getLong($i * $sub + $p); $s2 += $y * $y;
         |      }
         |      $qn2[$i] = $s1; $dn2[$i] = $s2;
         |    }
         |    double $score = 0.0;
         |    for (int $i = 0; $i < $t; $i++) {
         |      double $m = -java.lang.Double.MAX_VALUE;
         |      for (int $j = 0; $j < $t; $j++) {
         |        long $dot = 0L;
         |        for (int $p = 0; $p < $sub; $p++) {
         |          $dot += $q.getLong($i * $sub + $p) * $d.getLong($j * $sub + $p);
         |        }
         |        double $c = ($qn2[$i] == 0L || $dn2[$j] == 0L) ? 0.0
         |          : (double) $dot / (java.lang.Math.sqrt((double) $qn2[$i])
         |                             * java.lang.Math.sqrt((double) $dn2[$j]));
         |        if ($c > $m) { $m = $c; }
         |      }
         |      $score += $m;
         |    }
         |    ${ev.value} = $score;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

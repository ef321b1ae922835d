package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd quantized dot product over two `array<float>`
  * columns: Σ floor(aᵢ·scale)·floor(bᵢ·scale) as BIGINT.
  *
  * Exists because Spark's higher-order functions (`zip_with` +
  * `aggregate`, the portable formulation in [[VectorFunctions]]) are
  * CodegenFallback — every row pays interpreted-lambda overhead, which
  * dominates brute-force similarity scans. This expression generates a
  * tight primitive loop inside whole-stage codegen instead. Arithmetic
  * is bit-identical to the portable form (same float→double→floor→long
  * sequence), so oracle hashes are unchanged.
  *
  * Null semantics mirror zip_with+aggregate: NULL if either array is
  * NULL, lengths differ, or any element is NULL.
  */
case class DotQuantized(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_q requires two array<float> inputs, got $other")
    }

  override def nullable: Boolean = true

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += math.floor(a.getFloat(i).toDouble * scale).toLong *
        math.floor(b.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("arrA")
    val b = ctx.freshName("arrB")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          $ad $a = ${leftGen.value};
          $ad $b = ${rightGen.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            boolean $ok = true;
            long $acc = 0L;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $ok = false; break; }
              $acc += (long) Math.floor((double) $a.getFloat($i) * $scale)
                    * (long) Math.floor((double) $b.getFloat($i) * $scale);
            }
            if ($ok) { ${ev.isNull} = false; ${ev.value} = $acc; }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotQuantized =
    copy(left = newLeft, right = newRight)
}

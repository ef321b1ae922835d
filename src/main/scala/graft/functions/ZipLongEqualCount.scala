package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of positions where two equal-length `array<bigint>` columns
  * agree — the MinHash similarity estimator (matching-signature
  * fraction numerator).
  *
  * Replaces `aggregate(zip_with(a, b, eq), 0, +)`, which is
  * CodegenFallback: interpreted lambdas per candidate pair dominate the
  * LSH verify stage. This generates a primitive loop inside whole-stage
  * codegen.
  *
  * Contract (STRICTER than the zip_with formulation, by design): NULL
  * if either array is NULL or the lengths differ — a length mismatch
  * means the signatures were built with different K, and zip_with's
  * behavior there (pad with NULL, count the padded tail as 0 matches)
  * would silently understate similarity; surfacing NULL makes the
  * misuse visible. Elements are assumed non-null (fixed-K signature
  * arrays never contain nulls).
  */
case class ZipLongEqualCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zip_equal_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "zip_equal_count reads elements as primitive longs; a null " +
            "element would silently corrupt the count. Wrap nullable " +
            "inputs in KnownNoNullElements (validated narrowing) first")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"zip_equal_count requires two array<bigint> inputs, got $other")
    }

  override def nullable: Boolean = true

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var acc = 0L
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) acc += 1
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
            long $acc = 0L;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.getLong($i) == $b.getLong($i)) $acc++;
            }
            ${ev.isNull} = false;
            ${ev.value} = $acc;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZipLongEqualCount =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two SORTED `array<bigint>` columns via a linear merge —
  * the verification kernel of prefix-filtered set-similarity joins
  * (Bayardo et al., WWW'07).
  *
  * Exists because `size(array_intersect(a, b))` allocates a hash set and
  * an output array per row; on millions of candidate pairs the
  * verification step dominates the join. The merge does zero allocation
  * and runs inside whole-stage codegen.
  *
  * Preconditions: both arrays ascending-sorted (`sort_array`), elements
  * distinct and non-null — exactly what the dedup postings pipeline
  * produces. NULL array on either side → NULL out (like array_intersect).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "sorted_intersect_count reads elements as primitive longs; a " +
            "null element would silently corrupt the count. Wrap nullable " +
            "inputs in KnownNoNullElements (validated narrowing) first")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires two array<bigint> inputs, got $other")
    }

  override def nullable: Boolean = true

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { acc += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("arrA")
    val b = ctx.freshName("arrB")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
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
          int $na = $a.numElements();
          int $nb = $b.numElements();
          int $i = 0; int $j = 0;
          long $acc = 0L;
          while ($i < $na && $j < $nb) {
            long $x = $a.getLong($i);
            long $y = $b.getLong($j);
            if ($x == $y) { $acc++; $i++; $j++; }
            else if ($x < $y) { $i++; } else { $j++; }
          }
          ${ev.isNull} = false;
          ${ev.value} = $acc;
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

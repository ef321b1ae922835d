package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: 64-bit FNV-1a over a binary column.
  *
  * The engine's content-fingerprint primitive (document rolling-hash /
  * media checksum — the north-star fingerprinting operator). A native
  * `Expression` with `doGenCode` rather than a Scala UDF so it stays
  * inside whole-stage codegen: no boxing, no serialization, and the
  * generated loop JIT-vectorizes like the rest of the pipeline — the
  * preference order the build mandates (native Expression > UDF).
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  protected override def nullSafeEval(input: Any): Any =
    Fnv64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  /** FNV-1a 64-bit; overflow wraps in Long arithmetic by design. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

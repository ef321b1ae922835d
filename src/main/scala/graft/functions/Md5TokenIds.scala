package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct whitespace-token md5-derived 40-bit ids of a string column,
  * as `array<bigint>` — the native form of the minhash sketch's
  * tokenization stage:
  *
  *   transform(array_distinct(split(text, " ")),
  *     t -> conv(substring(md5(t), 1, 10), 16, 10))
  *
  * bit-for-bit (same single-space split including empty tokens from
  * runs of separators, same first-occurrence distinct order, same
  * top-40-bits-of-md5 id), but in ONE pass over the row's bytes with a
  * reused digest — the higher-order-function form is interpreted
  * (CodegenFallback) and allocates a UTF8String + lambda frame per
  * token, which dominated the K-hash sketch stage it feeds
  * ([[MinhashSigs]]).
  *
  * The id keeps md5's cross-engine reproducibility (the SQL oracle
  * computes the identical value), which is the whole reason this
  * pipeline hashes with md5 rather than a faster non-portable hash.
  */
case class Md5TokenIds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_token_ids requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_token_ids"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5TokenIds.ids(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    defineCodeGen(ctx, ev,
      c => s"new $gad(graft.functions.Md5TokenIds.ids($c.getBytes()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5TokenIds =
    copy(child = newChild)
}

object Md5TokenIds {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First-occurrence-distinct token ids; tokens split on single 0x20
    * bytes exactly like `split(text, " ")` (runs of separators yield
    * empty tokens, which hash like any other token). */
  def ids(bytes: Array[Byte]): Array[Long] = {
    val md = digests.get()
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val tok = new String(bytes, start, i - start,
          java.nio.charset.StandardCharsets.UTF_8)
        if (seen.add(tok)) {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          out += ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
            ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
        }
        start = i + 1
      }
      i += 1
    }
    out.result()
  }
}

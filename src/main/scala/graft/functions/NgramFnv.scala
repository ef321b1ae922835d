package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a hash of every `n`-byte window of a string column, as
  * `array<bigint>` — character-shingle ids without materializing one
  * substring per position (which dominates n-gram postings construction:
  * L allocations of n-char strings per row versus one byte-array copy
  * here). A short input (length < n) yields ONE hash of the whole
  * input, mirroring `substr(text, 1, n)` semantics on short strings.
  *
  * Byte windows equal character windows on the ASCII corpus
  * (TESTDATA.md); for general UTF-8 the shingle boundaries shift but
  * set-overlap semantics (the only consumer) survive.
  */
case class NgramFnv(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_fnv requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_fnv"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      NgramFnv.hashes(input.asInstanceOf[UTF8String].getBytes, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    defineCodeGen(ctx, ev,
      c => s"new $gad(graft.functions.NgramFnv.hashes($c.getBytes(), $n))")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramFnv =
    copy(child = newChild)
}

object NgramFnv {
  /** FNV-1a of each n-byte window; one window of the full input when
    * it is shorter than n. */
  def hashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val count = math.max(bytes.length - n + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0xcbf29ce484222325L
      val end = math.min(i + n, bytes.length)
      var j = i
      while (j < end) {
        h ^= bytes(j) & 0xffL
        h *= 0x100000001b3L
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }
}

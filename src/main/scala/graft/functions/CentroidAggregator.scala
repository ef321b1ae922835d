package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator summing fixed-point-quantized embedding dimensions —
  * the cluster-centroid builder for the IVF similarity path.
  *
  * Works in exact integer space (floor(x·scale) per dimension) so the
  * merge order across partitions can never change the result — the same
  * discipline that makes the rest of the engine oracle-checkable. The
  * centroid itself is (sums, count); the float centroid is a final
  * division at read time.
  */
class QuantizedCentroid(dim: Int, scale: Int)
    extends Aggregator[Array[Float], (Array[Long], Long), (Array[Long], Long)]
    with Serializable {

  override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)

  override def reduce(acc: (Array[Long], Long), v: Array[Float]): (Array[Long], Long) = {
    val (sums, n) = acc
    var i = 0
    while (i < dim && i < v.length) {
      sums(i) += math.floor(v(i).toDouble * scale).toLong
      i += 1
    }
    (sums, n + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    val (sa, na) = a; val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(acc: (Array[Long], Long)): (Array[Long], Long) = acc

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
}

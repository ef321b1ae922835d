package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal private[sql]-scope bridge: Spark 4 moved Column↔Expression
  * conversion behind `private[sql] classic.ExpressionUtils`; extension
  * libraries building Columns from custom Catalyst expressions need this
  * one-hop re-export (the alternative — registering every expression in
  * a FunctionRegistry — couples library calls to session configuration).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Listener events are delivered async; the bench harness must drain
    * the bus before reading its task-metric counters (`listenerBus` is
    * private[spark]). */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.Fnv64

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's native expressions with the session's function
  * registry so they are callable from SQL and `call_function` alike.
  * Custom Rules/Strategies would be injected here too; reference parity
  * needs none (SURVEY.md §4) — Catalyst's rewrite set covers it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"fnv64 expects exactly 1 argument, got ${children.length}")
        Fnv64(children.head)
      }))
  }
}

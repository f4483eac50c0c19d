package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so
  * custom native expressions (graft.expressions._) need this one-file
  * shim inside the org.apache.spark.sql namespace — the conventional
  * extension-library pattern for wrapping a Catalyst Expression into a
  * user-facing Column without going through the function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

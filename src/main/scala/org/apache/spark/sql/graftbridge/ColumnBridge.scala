package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so
  * custom native expressions (graft.expressions._) need this one-file
  * shim inside the org.apache.spark.sql namespace — the conventional
  * extension-library pattern for wrapping a Catalyst Expression into a
  * user-facing Column without going through the function registry.
  *
  * Column → Expression goes through the session's ColumnNode
  * converter, not `ExpressionUtils.expression`: the latter wraps the
  * node in a lazy `ColumnNodeExpression` that the analyzer treats as
  * opaque and codegen rejects (Unevaluable) when the result is spliced
  * into a function-registry builder (graft_call). The converter emits
  * real catalyst nodes (UnresolvedFunction/UnresolvedAttribute/...)
  * that resolve like any parsed SQL.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}

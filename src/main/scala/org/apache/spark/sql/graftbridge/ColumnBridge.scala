/* Bridge into Spark's `private[sql]` Column <-> Expression converters.
 * Spark 4.x made `Column` wrap a ColumnNode (Connect unification); the
 * classic converter lives at org.apache.spark.sql.classic.ExpressionUtils
 * with private[sql] Scala visibility, so a same-package shim is the
 * supported-jar way for a library to expose custom Catalyst Expressions
 * as Columns. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. `expression` wraps the
    * column in a lazily-converted ColumnNodeExpression, which only the
    * Dataset API boundary unwraps — inside a FunctionRegistry builder
    * (SQL `injectFunction` seam) it reaches the analyzer unconverted
    * and fails type checks as VOID. Converting the node eagerly yields
    * the plain (possibly unresolved) Catalyst tree a SQL function
    * builder must return, exactly what the parser itself would emit. */
  def eagerExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}

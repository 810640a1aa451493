package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge for the engine's native Catalyst
 * expressions ([[graft.functions.DoubleDotProduct]]). Spark 4 made the
 * classic `Column(expr)` constructor `private[sql]` (the public Column
 * API is Connect-portable ColumnNodes); a library shipping its own
 * codegen'd expressions reaches the classic converter through a file in
 * the `org.apache.spark.sql` namespace — the established extension
 * pattern, kept to this ONE minimal file.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

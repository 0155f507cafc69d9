// Lives under org.apache.spark.sql so it can see the private[sql]
// Column ⇄ Expression bridge — the one hook needed to expose custom Catalyst
// expressions (e.g. graft.functions.SimHash64) as user-facing Columns.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SparkShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column→Expression conversion (Spark 4
  * moved `Column.expr` behind the classic/connect split). Lives in the
  * spark.sql package solely to re-export that one hook — the standard
  * extension-library pattern for plan-level integrations.
  */
object GraftColumnBridge {
  /** Eagerly converted Catalyst tree (`ExpressionUtils.expression` alone
    * returns a lazy `ColumnNodeExpression` wrapper whose children are
    * still sql-api ColumnNodes — useless for pattern matching).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}

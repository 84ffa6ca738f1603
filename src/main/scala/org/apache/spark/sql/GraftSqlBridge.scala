package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to `private[sql]` Column↔Expression conversion — the standard
 * pattern for libraries shipping custom Catalyst expressions on Spark 4's
 * split (api/classic) Column (cf. SNIPPETS.md [2], Qbeast's
 * `DatasetFactory` placed in `org.apache.spark.sql` for the same reason).
 */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}

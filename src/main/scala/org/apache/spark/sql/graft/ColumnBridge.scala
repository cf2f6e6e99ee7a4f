package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction (accessible from
  * org.apache.spark.sql subpackages): wrap a raw Catalyst [[Expression]]
  * into a public [[Column]] and back. Spark 4 removed the public
  * `Column(expr)` constructor (Columns are backed by column nodes); this
  * is the supported internal path the engine uses to place expressions
  * Spark exposes no DSL for — e.g. [[org.apache.spark.sql.catalyst
  * .expressions.BloomFilterMightContain]], the codegen'd probe behind
  * the runtime row-level-filtering feature — directly into a plan. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

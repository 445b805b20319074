package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface (Column ↔ Expression
  * conversion moved behind ExpressionUtils in Spark 4.x). Lives in the
  * org.apache.spark.sql package tree for access — the standard pattern
  * for third-party native-Expression libraries. Keep this file tiny:
  * everything else stays in the graft.* packages.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Public alias for the `private[sql]` type-expectation supertype, so
    * graft Expressions can declare `inputTypes` (ExpectsInputTypes). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Stable per-session identity (`sessionUUID` is `private[sql]`);
    * non-classic sessions fall back to identity hashing. */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String = s match {
    case cs: org.apache.spark.sql.classic.SparkSession => cs.sessionUUID
    case other => String.valueOf(System.identityHashCode(other))
  }
}

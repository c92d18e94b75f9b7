package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Access shim for Spark's `private[sql]` V2→V1 predicate conversion:
  * the engine's `canDeleteWhere` guard must test LEAF convertibility
  * with exactly the conversion the `SupportsDelete` bridge will run,
  * because that bridge is LOSSY on `OR` (an OR with one untranslatable
  * side converts to just the other side — a strictly stronger filter —
  * and the bridge's array-length check cannot see it). See
  * `GraftLakeTable.faithfulToV1`. */
object PredicateBridge {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}

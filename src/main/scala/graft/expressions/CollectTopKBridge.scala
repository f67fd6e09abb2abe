package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.{Column, GraftBridge}

/** Accessor for Spark's `private[aggregate]` [[CollectTopK]] — the bounded
  * top-k collect: an ObjectHashAggregate whose partial (map-side) state is
  * a k-bounded priority queue per group, so the shuffle carries at most
  * k rows per group per map task and NOTHING is ever sorted. This is the
  * plan a per-key cap wants at 100 TB: the `row_number() OVER (...)` form
  * sorts every input row twice; this merges k-bounded heaps.
  *
  * Same bridge technique as [[org.apache.spark.sql.GraftBridge]]: one
  * file in the owning package exposing exactly the needed constructor.
  */
object GraftCollectTopK {
  /** Aggregate column: array of the k smallest (`asc=true`, output
    * ascending) or largest (`asc=false`, output descending) values of
    * `child` under the natural (lexicographic-for-struct) ordering.
    * `child`'s type must be orderable (no maps). */
  def column(child: Column, k: Int, asc: Boolean): Column =
    GraftBridge.column(
      CollectTopK(GraftBridge.expression(child), k, reverse = asc)
        .toAggregateExpression())
}

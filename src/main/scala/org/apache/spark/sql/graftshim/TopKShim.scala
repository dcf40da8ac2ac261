package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** Bridge to Spark's `private[aggregate]` [[CollectTopK]] — the
  * bounded-heap typed aggregate behind `Dataset.tail`-style top-k.
  * Exposed as a Column so [[graft.operators.Similarity.topKPerQuery]]
  * can run per-query top-k as ONE ObjectHashAggregate: the partial
  * (map-side) buffer never holds more than `num` rows per group, so
  * the shuffle carries ≤ tasks × groups × num elements — the same
  * bound as a hand-rolled per-partition heap, but inside the SQL
  * engine (no RDD drop-out, no DeserializeToObject, spill-aware
  * serialization inherited from Collect).
  *
  * With `reverse = true` the heap keeps the smallest `num` elements
  * under the child's (for structs: lexicographic) ordering and `eval`
  * emits them sorted ASCENDING — smallest first.
  */
object TopKShim {
  def collectTopK(child: Column, num: Int, reverse: Boolean): Column =
    ColumnShim.column(
      CollectTopK(ColumnShim.expression(child), num, reverse)
        .toAggregateExpression())
}

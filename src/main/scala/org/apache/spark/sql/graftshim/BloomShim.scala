package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bridge to Spark's internal Bloom-filter expressions — the pair the
  * optimizer itself injects for runtime row-group filtering
  * (`InjectRuntimeFilter`): [[BloomFilterAggregate]] builds a sketch
  * distributively (map-side partial blooms merged by OR — one pass, no
  * driver `treeAggregate`), and [[BloomFilterMightContain]] is a
  * codegen'd scan predicate over the serialized sketch.
  *
  * Used by `graft.operators.Dedup.bloomNovel` for incremental-ingest
  * dedup: bloom the small NEW batch, scan the huge reference corpus
  * with the broadcast-literal sketch, exact-verify only the positives.
  * Both expressions require LongType values — feed `xxhash64(...)`.
  */
object BloomShim {
  /** Aggregate a LongType column into a serialized Bloom filter
    * (BinaryType; null on empty input).
    */
  def bloomAgg(child: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnShim.column(
      BloomFilterAggregate(ColumnShim.expression(child),
        Literal(estimatedItems), Literal(numBits), 0, 0)
        .toAggregateExpression())

  /** `might_contain(bloom, value)`: bloom must be a foldable
    * BinaryType (a `lit(bytes)`), value LongType. No false negatives.
    */
  def mightContain(bloom: Column, value: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(bloom), ColumnShim.expression(value)))
}

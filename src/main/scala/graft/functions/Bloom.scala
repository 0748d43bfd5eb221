package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge

/** Column wrappers over Spark's OWN bloom-filter expressions — the
  * machinery behind runtime row-group filtering (InjectRuntimeFilter),
  * not exposed in the public function registry. This is THE
  * decontamination structure at scale: the benchmark side folds to one
  * broadcast-able binary (bits are an order-insensitive OR, so the
  * result is deterministic under any partitioning), and candidates probe
  * it per gram with zero joins — where the exact-set semi-join (q60)
  * must ship and hash the whole benchmark gram set per executor.
  *
  * Bloom guarantees probed by q122's oracle: NO false negatives (every
  * inserted value always hits), false positives bounded by sizing —
  * engine-specific bits, engine-independent contracts.
  */
object Bloom {

  /** Aggregate a LONG column into a bloom filter (binary). Size the
    * estimate at or above the true distinct count — overprovisioning
    * only lowers the false-positive rate. */
  def bloomAgg(values: Column, estimatedNumItems: Long): Column =
    bridge.column(new BloomFilterAggregate(bridge.expression(values),
      estimatedNumItems).toAggregateExpression())

  /** Membership probe: true if `value` (long) might be in `bloom`;
    * never false for an inserted value. */
  def mightContain(bloom: Column, value: Column): Column =
    bridge.column(BloomFilterMightContain(bridge.expression(bloom),
      bridge.expression(value)))
}

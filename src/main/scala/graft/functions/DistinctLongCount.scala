package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed distinct-set accumulator — the reference carries `Set<Long>`
  * accumulators inside its aggregation bean and sizes them at window
  * close (`bean/ProductStats.java:82-90`,
  * `app/dws/ProductStatsApp.java:255-257`). This is the same shape as a
  * reusable `Aggregator`: exact distinct count with a mergeable set
  * buffer (partial-aggregation friendly). The buffer is unbounded —
  * this is the exact/oracle form for bounded-cardinality keys; the
  * memory-bounded scale path behind the same interface is
  * [[HllDistinctLongCount]] (fixed 4 KiB HLL registers per key). */
class DistinctLongCount extends Aggregator[Long, Set[Long], Long] {
  override def zero: Set[Long] = Set.empty
  override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
  override def merge(x: Set[Long], y: Set[Long]): Set[Long] = x ++ y
  override def finish(s: Set[Long]): Long = s.size.toLong
  override def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

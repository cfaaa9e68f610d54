package graft.ext

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the custom-aggregate escalation path (SURVEY §2.8)
  * for state the built-in aggregates cannot express.
  *
  * The window-based [[SketchQueries.sketchDistinct]] materializes and
  * sorts EVERY distinct hash per group to find the k-th smallest — exact,
  * but per-group work grows with cardinality. This Aggregator keeps only
  * the k smallest distinct hashes per group (a bounded TreeSet buffer),
  * so per-group state is O(k) no matter the cardinality, partial
  * aggregation (map-side combine) applies, and merges are sorted-set
  * unions — the same associativity HyperLogLog offers, with the
  * difference that KMV's estimate is reproducible by the DuckDB oracle
  * (`q_sketch_kmv`): both engines see the identical k-th smallest hash.
  *
  * Estimate: `(k-1) * 2^32 / h_k` with h_k the k-th smallest distinct
  * hash in the shared md5-derived 32-bit space; fewer than k distinct
  * values → the buffer IS the exact distinct set, return its size.
  */
class KmvSketch(k: Int) extends Aggregator[Long, TreeSet[Long], Double] {

  override def zero: TreeSet[Long] = TreeSet.empty[Long]

  override def reduce(buf: TreeSet[Long], h: Long): TreeSet[Long] =
    trim(buf + h) // TreeSet dedups; trim keeps the k smallest

  override def merge(a: TreeSet[Long], b: TreeSet[Long]): TreeSet[Long] =
    trim(a ++ b)

  override def finish(buf: TreeSet[Long]): Double =
    if (buf.size < k) buf.size.toDouble
    // buf.max IS the k-th smallest (the buffer holds exactly the k
    // smallest distinct values); rounding is left to the caller so both
    // engines round the identical raw double once.
    else (k - 1).toDouble * 4294967296.0 / buf.max

  private def trim(s: TreeSet[Long]): TreeSet[Long] =
    if (s.size <= k) s else s.take(k)

  override def bufferEncoder: Encoder[TreeSet[Long]] =
    Encoders.kryo[TreeSet[Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed [[Aggregator]]: keeps the k FIRST elements under the
  * given ordering in a buffer that never exceeds k entries.
  *
  * This is the scale-safe replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` idiom: a window
  * materializes and sorts the ENTIRE partition on one task (a hot group —
  * one signature bucket holding a million near-identical vectors, one
  * language holding half the corpus — becomes one task's sort), whereas an
  * Aggregator participates in partial aggregation, so every map task
  * reduces its slice of a group to k rows before anything shuffles. Per-row
  * cost is O(1) once the buffer saturates (the common case: compare against
  * the current worst and discard) and O(k) on insert; k is assumed small
  * (top-k selection, not top-half).
  *
  * The buffer is kept sorted, so `merge` is a bounded merge and `finish`
  * returns the elements already in final order — callers `posexplode` the
  * result to recover ranks 1..k deterministically. Ties must be broken by
  * the ordering itself (include a unique id as the last component);
  * otherwise results are nondeterministic under partial aggregation, like
  * any Spark aggregate over an unordered input.
  */
class TopKAgg[T](k: Int)(implicit ord: Ordering[T], enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(k > 0, "k must be positive")
  def zero: Seq[T] = Vector.empty

  def reduce(b: Seq[T], a: T): Seq[T] =
    if (b.length >= k && ord.lteq(b.last, a)) b // saturated fast path: O(1)
    else {
      val (lt, ge) = b.span(x => ord.lt(x, a))
      ((lt :+ a) ++ ge).take(k)
    }

  def merge(a: Seq[T], b: Seq[T]): Seq[T] = {
    // bounded sorted merge: both inputs are sorted and <= k long
    val out = scala.collection.mutable.ArrayBuffer.empty[T]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toVector
  }

  def finish(r: Seq[T]): Seq[T] = r
  def bufferEncoder: Encoder[Seq[T]] = enc
  def outputEncoder: Encoder[Seq[T]] = enc
}

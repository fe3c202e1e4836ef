package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches for corpus accounting at 100-TB
  * scale, where an exact `COUNT(DISTINCT shingle)` is a corpus-wide
  * shuffle of every distinct value and a sketch is one pass with a
  * k-bounded buffer per task.
  *
  * The sketch is KMV (k minimum values, Bar-Yossef et al. 2002 / the
  * theta-sketch family): keep the k smallest DISTINCT 32-bit hash values;
  * the k-th smallest value h_k estimates the distinct count as
  * `(k-1) * 2^32 / h_k`. Everything here is INTEGER arithmetic on the
  * md5-prefix hash the sampling operators already key on
  * ([[Sampling.hash32]] — same spelling, same DuckDB mirror), so a
  * cross-engine oracle can replay the sketch EXACTLY: same hashes, same
  * k-smallest set, same integer division — hash-gateable, unlike
  * HyperLogLog whose estimator is float-rounding-sensitive.
  *
  * Scale shape: one scan, map-side partial aggregation with buffers
  * bounded at k entries BY CONSTRUCTION (the same argument as
  * [[TopKAgg]], plus distinctness inside the buffer), a one-row result.
  * The union/intersection estimate combines two one-row sketches — O(k)
  * driver-free column work, no second corpus pass.
  */
object Sketch {

  private val TwoPow32 = 4294967296L

  /** Bounded k-minimum-DISTINCT-values typed [[Aggregator]]: the buffer is
    * a sorted Seq of at most k distinct longs. Differs from [[TopKAgg]]
    * only in dropping duplicates — KMV's estimator is defined on the set
    * of distinct hash values, so a value seen a billion times occupies
    * (at most) one slot.
    */
  class KMinDistinctAgg(k: Int)(implicit enc: Encoder[Seq[Long]])
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, "k must be positive")
    def zero: Seq[Long] = Vector.empty

    def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.length >= k && b.last <= a) b // saturated fast path: O(1)
      else {
        val (lt, ge) = b.span(_ < a)
        if (ge.nonEmpty && ge.head == a) b // already present
        else ((lt :+ a) ++ ge).take(k)
      }

    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      mergeDistinct(a, b, k)

    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] = enc
    def outputEncoder: Encoder[Seq[Long]] = enc
  }

  /** sorted-distinct merge of two sorted-distinct seqs, truncated at k */
  private[ops] def mergeDistinct(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && a(i) <= b(j))) {
        if (out.isEmpty || out.last != a(i)) out += a(i)
        i += 1
      } else {
        if (out.isEmpty || out.last != b(j)) out += b(j)
        j += 1
      }
    }
    out.toVector
  }

  /** KMV estimate from a sorted-distinct sketch: exact when the sketch
    * holds the whole hash set (n_kept < k), `(k-1) * 2^32 / h_k` (integer
    * division) when saturated.
    */
  private[ops] def estimate(sketch: Seq[Long], k: Int): Long =
    if (sketch.length < k) sketch.length.toLong
    else (k - 1).toLong * TwoPow32 / sketch.last

  /** ONE spelling of the value→hash projection, shared by every sketch
    * entry point so the q98/q99/q104 oracle mirrors cannot drift apart.
    * NULL values are excluded (SQL COUNT(DISTINCT) semantics).
    */
  private def hashCol(valueCol: Column): Column =
    Sampling.hash32(valueCol).as("h")

  /** One-row sorted-distinct `sketch` array over a frame of `h` hash rows.
    * The KMV estimator is undefined at k=1 (numerator k-1 = 0), hence the
    * k >= 2 floor on every entry point.
    */
  private def sketchOfHashes(hashRows: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "KMV estimator is defined for k >= 2")
    val spark = hashRows.sparkSession
    import spark.implicits._
    // typed select (the untyped overload rejects a TypedColumn at runtime)
    hashRows.filter(col("h").isNotNull).as[Long]
      .select(new KMinDistinctAgg(k).toColumn).toDF("sketch")
  }

  /** Finish a one-row sketch frame into the public triple
    * `(n_kept, kth_hash, est_distinct)`; `kth_hash` is -1 when the value
    * universe is smaller than k (the estimate is then EXACT — it is the
    * universe size).
    */
  private def finishSketch(skDf: DataFrame, k: Int): DataFrame = {
    val spark = skDf.sparkSession
    import spark.implicits._
    skDf.select(col("sketch")).as[Seq[Long]]
      .map { sk =>
        (sk.length.toLong, if (sk.length < k) -1L else sk.last, estimate(sk, k))
      }.toDF("n_kept", "kth_hash", "est_distinct")
  }

  /** The raw one-row sketch of `valueCol` (`sketch: array<long>`) — the
    * PERSISTABLE form: sketches of disjoint (or overlapping) corpus slices
    * written as rows of this shape merge losslessly via [[kmvMerge]], so a
    * standing store of per-batch sketch rows IS a running distinct count
    * ([[graft.streaming.StreamingSketch]] builds on exactly this).
    */
  def kmvSketch(df: DataFrame, valueCol: Column, k: Int): DataFrame =
    sketchOfHashes(df.select(hashCol(valueCol)), k)

  /** One-row KMV distinct-count estimate of `valueCol`:
    * `(n_kept, kth_hash, est_distinct)`.
    */
  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int): DataFrame =
    finishSketch(kmvSketch(df, valueCol, k), k)

  /** Incremental form: merge a standing store of sketch rows (any number
    * of rows of [[kmvSketch]] shape — per-batch sketches, per-shard
    * sketches) with a NEW batch of raw values, and return the merged
    * `(n_kept, kth_hash, est_distinct)` over everything the store has seen
    * plus the batch. Correct because each stored row kept the k smallest
    * distinct hashes of its slice: the k smallest of (∪ sketches ∪ batch
    * hashes) equal the k smallest of the underlying union.
    *
    * Scale shape: the store contributes |store rows| × k hash rows (tiny),
    * the batch one scan; ONE bounded aggregation over both — per-ingest
    * cost grows with the batch, never with a re-scan of the corpus.
    */
  def kmvMerge(storeSketches: DataFrame, batch: DataFrame, valueCol: Column,
      k: Int): DataFrame = {
    val storeH = storeSketches.select(explode(col("sketch")).as("h"))
    val batchH = batch.select(hashCol(valueCol))
    finishSketch(sketchOfHashes(storeH.unionByName(batchH), k), k)
  }

  /** KMV set-operation estimates between two corpora (the release-diff
    * question "how much does snapshot B overlap snapshot A?" asked at a
    * scale where the exact answer is a join of everything): builds both
    * sketches, combines the two k-bounded arrays, and returns one row
    * `(n_union_kept, union_kth_hash, est_union, rho, est_intersection)`.
    *
    * The union sketch (k smallest of sketchA ∪ sketchB) is a valid KMV
    * sketch of A ∪ B because each side kept the k smallest of its own
    * universe. `rho` counts union-sketch members present in BOTH side
    * sketches; `est_intersection = rho * est_union / |union sketch|`
    * (integer division) — the standard KMV Jaccard estimator, exact when
    * both universes fit under k.
    */
  def kmvOverlap(dfA: DataFrame, dfB: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val spark = dfA.sparkSession
    import spark.implicits._
    // two one-row frames; the cross join is 1x1 (no skew, no data motion
    // beyond the two k-length arrays)
    val joined = kmvSketch(dfA, valueCol, k).withColumnRenamed("sketch", "ska")
      .crossJoin(kmvSketch(dfB, valueCol, k).withColumnRenamed("sketch", "skb"))
      .as[(Seq[Long], Seq[Long])]
    joined.map { case (ska, skb) =>
      val un = mergeDistinct(ska, skb, k)
      val (sa, sb) = (ska.toSet, skb.toSet)
      val rho = un.count(h => sa.contains(h) && sb.contains(h)).toLong
      val estU = estimate(un, k)
      val estI = if (un.isEmpty) 0L else rho * estU / un.length
      (un.length.toLong, if (un.length < k) -1L else un.last, estU, rho, estI)
    }.toDF("n_union_kept", "union_kth_hash", "est_union", "rho", "est_intersection")
  }
}

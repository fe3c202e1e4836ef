package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Inverted-index shard construction: term -> (document frequency, total
  * term frequency, delta-encoded posting list) — the retrieval-side
  * artifact a corpus pipeline emits next to the training shards (BM25
  * retrieval over the corpus, dedup forensics, quality auditing).
  *
  * Scale shape: ONE `groupBy(term, doc_id)` with map-side partials computes
  * per-doc term frequencies, then ONE `groupBy(term)` whose aggregation
  * buffer is bounded at `maxPostings` entries BY CONSTRUCTION
  * ([[PostingsAgg]] — the [[TopKAgg]] argument: a stopword appearing in
  * every document of a 100-TB corpus reduces to `maxPostings` postings on
  * every map task before anything shuffles, while its exact df/total_tf
  * ride the same buffer as two counters). No window, no corpus-sized sort,
  * no unbounded `collect_list`: the hot-term problem that kills naive index
  * builders is bounded before the Exchange.
  *
  * Postings are the `maxPostings` SMALLEST doc ids (ascending), gap-encoded
  * (`delta:tf`, delta from the previous doc id, first delta from 0) — the
  * standard compression layout, and deterministic, so the DuckDB oracle can
  * replay it with a ranked window + lag. Truncation is surfaced
  * (`truncated = df > maxPostings`), never silent.
  */
object IndexBuild {

  /** Bounded posting-list Aggregator: keeps the `k` smallest (doc_id, tf)
    * pairs in a sorted buffer PLUS exact df / total_tf counters. Input
    * pairs are distinct in doc_id per group (they come out of the
    * (term, doc_id) pre-aggregation), so df is a plain count.
    */
  class PostingsAgg(k: Int)
      extends Aggregator[(Long, Long), (Seq[(Long, Long)], Long, Long),
        (Seq[(Long, Long)], Long, Long)] {
    require(k > 0, "maxPostings must be positive")
    def zero: (Seq[(Long, Long)], Long, Long) = (Vector.empty, 0L, 0L)

    def reduce(b: (Seq[(Long, Long)], Long, Long), a: (Long, Long))
        : (Seq[(Long, Long)], Long, Long) = {
      val (buf, df, tf) = b
      val nb =
        if (buf.length >= k && buf.last._1 <= a._1) buf // saturated: O(1)
        else {
          val (lt, ge) = buf.span(_._1 < a._1)
          ((lt :+ a) ++ ge).take(k)
        }
      (nb, df + 1L, tf + a._2)
    }

    def merge(a: (Seq[(Long, Long)], Long, Long),
        b: (Seq[(Long, Long)], Long, Long)): (Seq[(Long, Long)], Long, Long) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (i, j) = (0, 0)
      val (ab, bb) = (a._1, b._1)
      while (out.length < k && (i < ab.length || j < bb.length)) {
        if (j >= bb.length || (i < ab.length && ab(i)._1 <= bb(j)._1)) {
          out += ab(i); i += 1
        } else { out += bb(j); j += 1 }
      }
      (out.toVector, a._2 + b._2, a._3 + b._3)
    }

    def finish(r: (Seq[(Long, Long)], Long, Long)): (Seq[(Long, Long)], Long, Long) = r
    def bufferEncoder: Encoder[(Seq[(Long, Long)], Long, Long)] =
      Encoders.product[(Seq[(Long, Long)], Long, Long)]
    def outputEncoder: Encoder[(Seq[(Long, Long)], Long, Long)] =
      Encoders.product[(Seq[(Long, Long)], Long, Long)]
  }

  /** Build the index over `docs` (doc_id numeric, text string).
    * Output: (term, df, total_tf, postings, truncated), postings =
    * "delta:tf,..." over the `maxPostings` smallest doc ids.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val agg = new PostingsAgg(maxPostings)
    tf.select(col("term"), col("doc_id"), col("tf"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("acc"))
      .map { case (term, (postings, df, totalTf)) =>
        val sb = new StringBuilder
        var prev = 0L
        postings.foreach { case (d, t) =>
          if (sb.nonEmpty) sb.append(',')
          sb.append(d - prev).append(':').append(t)
          prev = d
        }
        (term, df, totalTf, sb.toString, if (df > maxPostings) 1 else 0)
      }
      .toDF("term", "df", "total_tf", "postings", "truncated")
  }
}

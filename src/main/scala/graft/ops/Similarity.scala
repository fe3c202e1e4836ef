package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: queries are broadcast (small side), the corpus is scanned
  * once; per-partition bounded heaps keep the candidate set k-sized per
  * query so NOTHING quadratic ever shuffles — the shuffle payload is
  * (numPartitions x numQueries x k) rows, then a final per-query top-k.
  */
object Similarity {

  /** Cosine in double precision, left-to-right accumulation (the oracle
    * computes in double too).
    */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact brute-force top-k cosine neighbors for the given query ids.
    * Output: (vec_id, rank, neighbor_id) — rank 1..k by (sim desc,
    * neighbor_id asc) for determinism.
    */
  def bruteKnn(emb: DataFrame, queryIds: Seq[Long], k: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val typed = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Seq[Float])]
    // column-expression predicate -> pushed to the parquet scan
    val queries = typed.where(col("vec_id").isin(queryIds: _*)).collect()
    val qB = spark.sparkContext.broadcast(queries)

    // per-partition bounded top-k per query
    val partial = typed.mapPartitions { it =>
      val qs = qB.value
      val heaps = qs.map(q => (q._1, scala.collection.mutable.PriorityQueue
        .empty[(Double, Long)](Ordering.by(t => (-t._1, t._2)))))
      it.foreach { case (id, v) =>
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv) = qs(qi)
          if (qid != id) {
            val s = cosine(qv, v)
            val heap = heaps(qi)._2
            heap.enqueue((s, id))
            if (heap.size > k) heap.dequeue() // drops the current worst
            ()
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map(t => (qid, t._1, t._2)) }
    }.toDF("vec_id", "sim", "neighbor_id")

    // final exact top-k per query (tiny: parts * queries * k rows)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"))
  }

  /** LSH-bucketed ANN (random hyperplanes, seeded, with hamming<=maxHamming
    * multiprobe): the scale path. Returns (vec_id, neighbor_id, sim) for
    * each query — approximate; recall measured against bruteKnn in tests.
    */
  def lshAnn(emb: DataFrame, queryIds: Seq[Long], k: Int = 3, planes: Int = 10,
      maxHamming: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val rnd = new scala.util.Random(7)
    val hyper = Array.fill(planes, dim)(rnd.nextGaussian())
    val hB = spark.sparkContext.broadcast(hyper)

    def sigOf(v: Seq[Float]): Int = {
      val h = hB.value
      var sig = 0
      var p = 0
      while (p < h.length) {
        var dot = 0.0; var i = 0
        while (i < v.length) { dot += h(p)(i) * v(i); i += 1 }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      sig
    }

    val typed = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Seq[Float])]
    val sigs = typed.map { case (id, v) => (id, sigOf(v), v) }.toDF("vec_id", "sig", "embedding")
    val queries = sigs.where(col("vec_id").isin(queryIds: _*))
      .as[(Long, Int, Seq[Float])].collect()
    val qB = spark.sparkContext.broadcast(queries)

    sigs.as[(Long, Int, Seq[Float])].mapPartitions { it =>
      val qs = qB.value
      it.flatMap { case (id, sig, v) =>
        qs.iterator.collect {
          case (qid, qsig, qv) if qid != id &&
              java.lang.Integer.bitCount(sig ^ qsig) <= maxHamming =>
            (qid, id, cosine(qv, v))
        }
      }
    }.toDF("vec_id", "neighbor_id", "sim")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "sim")
  }
}

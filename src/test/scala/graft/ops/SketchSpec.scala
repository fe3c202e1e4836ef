package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spark.SparkTestSession

/** KMV sketch: estimator exactness under k, determinism of the saturated
  * estimate, aggregator laws under arbitrary partitioning, and the overlap
  * estimator's exact path.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  test("kmvDistinct: exact when universe < k, duplicates occupy one slot") {
    val df = Seq("a", "b", "c", "a", "a", "b").toDF("v")
    val out = Sketch.kmvDistinct(df, col("v"), k = 64)
      .as[(Long, Long, Long)].head()
    assert(out == ((3L, -1L, 3L))) // exact: 3 distinct, kth_hash sentinel
  }

  test("kmvDistinct: saturated estimate matches the closed form and is partition-invariant") {
    val vals = (0 until 5000).map(i => s"tok$i")
    val expectedSketch = vals.map(hash32).distinct.sorted.take(64)
    val expectedEst = 63L * 4294967296L / expectedSketch.last
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataset(vals).repartition(parts).toDF("v")
      val out = Sketch.kmvDistinct(df, col("v"), k = 64)
        .as[(Long, Long, Long)].head()
      assert(out == ((64L, expectedSketch.last, expectedEst)), s"parts=$parts")
    }
    // the estimate should be in the right ballpark for 5000 distinct values
    assert(expectedEst > 2500 && expectedEst < 10000)
  }

  test("KMinDistinctAgg: reduce/merge keep k smallest distinct, any order") {
    val agg = new Sketch.KMinDistinctAgg(4)
    val xs = Seq(9L, 3L, 3L, 7L, 1L, 8L, 1L, 2L, 5L)
    val left = xs.take(4).foldLeft(agg.zero)(agg.reduce)
    val right = xs.drop(4).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(left, right) == Seq(1L, 2L, 3L, 5L))
    assert(agg.merge(right, left) == Seq(1L, 2L, 3L, 5L))
    assert(xs.foldLeft(agg.zero)(agg.reduce) == Seq(1L, 2L, 3L, 5L))
  }

  test("kmvOverlap: exact path recovers true union and intersection under k") {
    val a = Seq("x", "y", "z", "w").toDF("v")
    val b = Seq("y", "z", "q").toDF("v")
    val out = Sketch.kmvOverlap(a, b, col("v"), k = 64)
      .as[(Long, Long, Long, Long, Long)].head()
    // union {x,y,z,w,q} = 5, intersection {y,z} = 2, both exact under k
    assert(out == ((5L, -1L, 5L, 2L, 2L)))
  }

  test("kmvOverlap: saturated estimates are consistent with the union sketch") {
    val a = (0 until 3000).map(i => s"v$i")
    val b = (1500 until 4500).map(i => s"v$i")
    val out = Sketch.kmvOverlap(a.toDF("v"), b.toDF("v"), col("v"), k = 128)
      .as[(Long, Long, Long, Long, Long)].head()
    val (nUnion, kth, estU, rho, estI) = out
    assert(nUnion == 128L && kth > 0)
    // replay the closed form from the two side sketches
    val ska = a.map(hash32).distinct.sorted.take(128)
    val skb = b.map(hash32).distinct.sorted.take(128)
    val un = (ska ++ skb).distinct.sorted.take(128)
    val expEstU = 127L * 4294967296L / un.last
    val expRho = un.count(h => ska.contains(h) && skb.contains(h)).toLong
    assert(estU == expEstU && rho == expRho)
    assert(estI == expRho * expEstU / 128)
    // sanity: true union 4500, true intersection 1500 — estimates within 2x
    assert(estU > 2250 && estU < 9000)
    assert(estI > 500 && estI < 4000)
  }

  test("count-min: estimate >= true count always; each row preserves total mass") {
    val docs = Seq((1L, "a a b c d"), (2L, "a b e f"), (3L, "g h a b"))
      .toDF("doc_id", "text")
    // width 4 forces collisions — the overestimate property must still hold
    val sketch = Sketch.cmsBuild(docs, width = 4, depth = 3)
    val rowMass = sketch.groupBy("seed").agg(sum("cnt").as("m"))
      .as[(Int, Long)].collect()
    assert(rowMass.length == 3 && rowMass.forall(_._2 == 13L))
    val exact = docs.select(explode(TextAnalysis.words(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("true_cnt"))
    val joined = Sketch.cmsEstimate(sketch, exact.select("tok"), width = 4, depth = 3)
      .join(exact, "tok").as[(String, Long, Long)].collect()
    assert(joined.length == 8)
    joined.foreach { case (tok, est, t) =>
      assert(est >= t, s"tok=$tok est=$est true=$t")
    }
  }

  test("count-min: slice sketches merge cell-wise to the full-corpus sketch") {
    val docs = (0 until 40).map(i => (i.toLong, s"t${i % 7} t${i % 11} common"))
      .toDF("doc_id", "text")
    val full = Sketch.cmsBuild(docs, width = 8, depth = 2)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketch.cmsBuild(docs.filter(col("doc_id") % 2 === 0), 8, 2)
      .unionAll(Sketch.cmsBuild(docs.filter(col("doc_id") % 2 === 1), 8, 2))
      .groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == full)
  }

  test("logBucket/bucketBounds: containment, monotonicity, <=25% relative width") {
    val (lo, hi) = Sketch.bucketBounds(col("b"))
    val rows = (0L until 4096L).toDF("v")
      .withColumn("b", Sketch.logBucket(col("v")))
      .select(col("v"), col("b"), lo.as("lo"), hi.as("hi"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    rows.foreach { case (v, b, l, h) =>
      assert(l <= v && v <= h, s"v=$v b=$b [$l,$h]")
      // exact buckets below 8; otherwise width (in x-space) <= lo_x / 4
      if (b < 8) assert(l == h) else assert(4 * (h - l + 1) <= l + 1)
    }
    assert(rows.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("bucketBounds: top-octave bounds saturate at Long.MaxValue, never wrap negative") {
    val (lo, hi) = Sketch.bucketBounds(col("b"))
    // values spanning 2^61 .. Long.MaxValue land in the octaves whose raw
    // shifts overflow; bounds must stay non-negative, ordered, containing
    val vals = Seq(1L << 61, (1L << 62) - 1, 1L << 62,
      (1L << 62) + (1L << 61), Long.MaxValue - 1, Long.MaxValue)
    val rows = vals.toDF("v")
      .withColumn("b", Sketch.logBucket(col("v")))
      .select(col("v"), col("b"), lo.as("lo"), hi.as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (v, b, l, h) =>
      assert(l >= 0 && h >= 0, s"wrapped: v=$v b=$b [$l,$h]")
      assert(l <= h, s"inverted: v=$v b=$b [$l,$h]")
      assert(l <= v && v <= h, s"containment: v=$v b=$b [$l,$h]")
    }
    // driver-side replica (histQuantiles.bounds) agrees with the columns
    val q = Sketch.histQuantiles(
      Sketch.logHistogram(vals.toDF("v"), col("v")), Seq(100))
      .select("lo_est", "hi_est").as[(Long, Long)].head()
    assert(q._1 >= 0 && q._1 <= q._2 && q._2 == Long.MaxValue)
  }

  test("histQuantiles: the true percentile value is inside every reported range") {
    val vals = (0 until 1000).map(i => (i.toLong * i * 31L) % 7919L)
    val ps = Seq(1, 25, 50, 75, 90, 99, 100)
    val out = Sketch.histQuantiles(
      Sketch.logHistogram(vals.toDF("v"), col("v")), ps)
      .select("p", "rank", "lo_est", "hi_est")
      .as[(Int, Long, Long, Long)].collect()
    val sorted = vals.sorted
    assert(out.length == ps.length)
    out.foreach { case (p, rank, lo, hi) =>
      assert(rank == (p.toLong * 1000 + 99) / 100)
      val truth = sorted((rank - 1).toInt)
      assert(lo <= truth && truth <= hi, s"p=$p truth=$truth [$lo,$hi]")
    }
  }

  test("cmsMerge/histMerge: merged slice sketches equal the one-shot sketch (linearity)") {
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 until 10).map(j => s"w${(i + j) % 7}").mkString(" "), (i * 37 % 500).toLong))
      .toDF("doc_id", "text", "n_chars")
    val (a, b) = (docs.filter(col("doc_id") < 15), docs.filter(col("doc_id") >= 15))
    assert(
      Sketch.cmsMerge(Seq(Sketch.cmsBuild(a), Sketch.cmsBuild(b)))
        .as[(Int, Long, Long)].collect().toSet ==
      Sketch.cmsBuild(docs).as[(Int, Long, Long)].collect().toSet)
    assert(
      Sketch.histMerge(Seq(
          Sketch.logHistogram(a, col("n_chars")),
          Sketch.logHistogram(b, col("n_chars"))))
        .as[(Long, Long)].collect().toSet ==
      Sketch.logHistogram(docs, col("n_chars")).as[(Long, Long)].collect().toSet)
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
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
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-algebra properties of the bounded top-k Aggregator — no Spark.
  * Partial aggregation evaluates reduce/merge in ARBITRARY tree order
  * across tasks, so correctness is exactly "any fold order gives
  * sorted.take(k)"; these checks pin that for the primitive q31 and
  * q57-q59 ride on (seeded exhaustive-ish sweep instead of ScalaCheck —
  * the bridge artifact is not on the classpath).
  */
class TopKAggSpec extends AnyFunSuite {

  private val ord: Ordering[(Int, Int)] = Ordering.Tuple2(Ordering.Int, Ordering.Int)

  private def foldArbitrarily(agg: TopKAgg[(Int, Int)],
      parts: Seq[List[(Int, Int)]], rnd: scala.util.Random): Seq[(Int, Int)] = {
    val buffers = scala.collection.mutable.Buffer(
      parts.map(p => p.foldLeft(agg.zero)(agg.reduce)): _*)
    if (buffers.isEmpty) agg.finish(agg.zero)
    else {
      while (buffers.length > 1) {
        val a = buffers.remove(rnd.nextInt(buffers.length))
        val j = rnd.nextInt(buffers.length)
        buffers(j) = agg.merge(a, buffers(j))
      }
      agg.finish(buffers.head)
    }
  }

  test("any partitioning + any merge-tree order == sorted.take(k), 400 seeded cases") {
    for (seed <- 0 until 400) {
      val rnd = new scala.util.Random(seed)
      val n = rnd.nextInt(40) // includes 0: empty input
      // small key space forces duplicate keys; the unique second component
      // (mostly) exercises tie-breaking through the full tuple ordering
      val items = List.fill(n)((rnd.nextInt(9) - 4, rnd.nextInt(1000)))
      val k = 1 + rnd.nextInt(6)
      val nParts = 1 + rnd.nextInt(5)
      val agg = new TopKAgg[(Int, Int)](k)(ord, null)
      val parts = Vector.fill(nParts)(
        scala.collection.mutable.ListBuffer.empty[(Int, Int)])
      items.foreach(x => parts(rnd.nextInt(nParts)) += x)
      val got = foldArbitrarily(agg, parts.map(_.toList), rnd)
      val want = items.sorted(ord).take(k)
      assert(got == want, s"seed=$seed k=$k parts=$nParts items=$items")
    }
  }

  test("buffer invariants: sorted, never exceeds k, saturated fast path keeps the best") {
    val agg = new TopKAgg[(Int, Int)](3)(ord, null)
    val buf = (1 to 100).map(i => (100 - i, i)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3 && buf == buf.sorted(ord))
    assert(buf == Seq((0, 100), (1, 99), (2, 98)))
    // a worse element on a full buffer is a no-op (the O(1) path)
    assert(agg.reduce(buf, (50, 0)) eq buf)
  }

  test("k must be positive") {
    assertThrows[IllegalArgumentException](new TopKAgg[(Int, Int)](0)(ord, null))
  }
}

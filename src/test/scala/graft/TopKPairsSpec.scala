package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.TopKPairsBuffer

/** The rerank-survivor kernel's contract: the kept set equals EXACTLY
  * what `ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) <= k` keeps,
  * independent of insertion/merge order — the property that lets the
  * SQ8 probes replace their candidate-set window with a bounded
  * aggregate without changing a single survivor.
  */
class TopKPairsSpec extends AnyFunSuite {

  private def oracle(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  test("property: buffer == window-kept set under any split/merge order") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 200) {
      val k = rnd.nextInt(16) + 1
      val n = rnd.nextInt(400)
      // unique ids (candidate ids are unique per query by
      // construction); scores drawn from a SMALL set to force ties
      val xs = rnd.shuffle((0 until n).map(i =>
        (rnd.nextInt(8).toDouble, i.toLong)).toList).toSeq
      val whole = new TopKPairsBuffer(k)
      xs.foreach { case (s, id) => whole.add(s, id) }
      assert(whole.result().toSeq === oracle(xs, k))
      // split into 3 partial buffers, merge in two orders
      val parts = xs.grouped(math.max(1, xs.size / 3 + 1)).toSeq
      def merged(order: Seq[Seq[(Double, Long)]]): Seq[(Double, Long)] = {
        val bufs = order.map { p =>
          val b = new TopKPairsBuffer(k)
          p.foreach { case (s, id) => b.add(s, id) }
          b
        }
        val acc = new TopKPairsBuffer(k)
        bufs.foreach(acc.merge)
        acc.result().toSeq
      }
      assert(merged(parts) === oracle(xs, k))
      assert(merged(parts.reverse) === oracle(xs, k))
    }
  }

  test("ties break on id ASC, exactly like the window ordering") {
    val b = new TopKPairsBuffer(2)
    Seq((1.0, 30L), (1.0, 10L), (1.0, 20L), (0.5, 1L))
      .foreach { case (s, id) => b.add(s, id) }
    assert(b.result().toSeq === Seq((1.0, 10L), (1.0, 20L)))
  }

  test("serialize round-trip preserves the kept set") {
    val b = new TopKPairsBuffer(4)
    (0 until 100).foreach(i => b.add((i * 37 % 53).toDouble, i.toLong))
    val rt = TopKPairsBuffer.deserialize(4, b.serialize())
    assert(rt.result().toSeq === b.result().toSeq)
  }
}

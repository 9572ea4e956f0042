package graft

import org.apache.spark.sql.graft.{BkBuffer, BkSampleQuantile}
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level laws of the bottom-k SAMPLE buffer (KmvBufferSpec's
  * discipline applied to the quantile companion): merge of arbitrary
  * partitionings equals a sequential fill equals the k smallest
  * distinct hashes each carrying the MIN value seen for that hash —
  * the determinism that makes q33 oracle-checkable.
  */
class BkBufferSpec extends AnyFunSuite {

  private def fill(vals: Seq[(Long, Long)], k: Int): BkBuffer = {
    val b = new BkBuffer(k)
    vals.foreach { case (h, x) => b.add(h, x) }
    b
  }

  private def entries(b: BkBuffer): Seq[(Long, Long)] = {
    val it = b.entries.entrySet().iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (it.hasNext) {
      val e = it.next(); out += ((e.getKey.longValue, e.getValue.longValue))
    }
    out.toSeq
  }

  test("merge of arbitrary partitions == sequential fill == k smallest " +
      "distinct hashes with MIN value per hash, any merge order") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val k = 2 + rnd.nextInt(15)
      // small hash domain → heavy duplication, value collisions
      val vals = Seq.fill(rnd.nextInt(200))(
        (rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      val whole = fill(vals, k)
      val cuts = (0 to rnd.nextInt(4))
        .map(_ => rnd.nextInt(vals.length + 1)).sorted
      val slices = (0 +: cuts :+ vals.length).sliding(2)
        .map { case Seq(a, b) => vals.slice(a, b) }.toSeq
      val parts = rnd.shuffle(slices.map(fill(_, k)))
      val acc = new BkBuffer(0) // merge-side buffer adopts k
      parts.foreach(acc.merge)
      val expect = vals.groupBy(_._1)
        .map { case (h, hx) => (h, hx.map(_._2).min) }
        .toSeq.sortBy(_._1).take(k)
      assert(entries(acc) === expect)
      assert(entries(whole) === expect)
      // serialize round-trip is identity (the stored-column contract)
      assert(BkBuffer.deserialize(acc.serialize()).serialize().toSeq
        === acc.serialize().toSeq)
    }
  }

  test("nearest-rank quantile: floor((m-1)q) over the value-sorted " +
      "sample; exact endpoints; null on empty") {
    val b = fill(Seq((1L, 50L), (2L, 10L), (3L, 40L), (4L, 20L),
      (5L, 30L)), 16)
    val bytes = b.serialize()
    assert(BkSampleQuantile.quantile(bytes, 0.0) === 10L)
    assert(BkSampleQuantile.quantile(bytes, 0.5) === 30L)
    assert(BkSampleQuantile.quantile(bytes, 0.9) === 40L) // floor(3.6)=3
    assert(BkSampleQuantile.quantile(bytes, 1.0) === 50L)
    assert(BkSampleQuantile.quantile(new BkBuffer(8).serialize(), 0.5)
      === null)
  }

  test("misuse fails loudly: add before a width is adopted, " +
      "mismatched widths, q out of range") {
    intercept[IllegalArgumentException] { new BkBuffer(0).add(1L, 1L) }
    val a = fill(Seq((1L, 1L)), 8)
    intercept[IllegalArgumentException] { a.merge(fill(Seq((2L, 2L)), 16)) }
    intercept[IllegalArgumentException] {
      BkSampleQuantile.quantile(a.serialize(), 1.5)
    }
  }
}

package graft

import org.apache.spark.sql.graft.KmvBuffer
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level laws of the KMV buffer (the Spark-side mergeability law
  * is locked in SketchQualitySpec; this pins the data structure itself
  * under randomized partitionings, duplicates, and serialization).
  */
class KmvBufferSpec extends AnyFunSuite {

  private def fill(vals: Seq[Long], k: Int): KmvBuffer = {
    val b = new KmvBuffer(k)
    vals.foreach(b.add)
    b
  }

  test("merge of arbitrary partitions == sequential fill == k smallest " +
      "distinct, under duplicates and any merge order") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val k = 1 + rnd.nextInt(16)
      // small value domain → heavy duplication
      val vals = Seq.fill(rnd.nextInt(200))(rnd.nextInt(60).toLong)
      val whole = fill(vals, k)
      val cuts = (0 to rnd.nextInt(4))
        .map(_ => rnd.nextInt(vals.length + 1)).sorted
      val slices = (0 +: cuts :+ vals.length).sliding(2)
        .map { case Seq(a, b) => vals.slice(a, b) }.toSeq
      val parts = rnd.shuffle(slices.map(fill(_, k)))
      val acc = new KmvBuffer(0) // merge-side buffer adopts k
      parts.foreach(acc.merge)
      val expect = vals.distinct.sorted.take(k)
      def mins(b: KmvBuffer): Seq[Long] = {
        val it = b.mins.iterator()
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) out += it.next()
        out.toSeq
      }
      assert(mins(acc) === expect)
      assert(mins(whole) === expect)
      // serialize round-trip is identity (the stored-column contract)
      assert(KmvBuffer.deserialize(acc.serialize()).serialize().toSeq
        === acc.serialize().toSeq)
    }
  }

  test("mismatched sketch widths refuse to merge") {
    val a = fill(Seq(1L, 2L), 8)
    val b = fill(Seq(3L), 16)
    intercept[IllegalArgumentException] { a.merge(b) }
  }
}

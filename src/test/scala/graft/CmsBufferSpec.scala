package graft

import org.apache.spark.sql.graft.CmsBuffer
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level laws of the count-min buffer (q37's kernel): the
  * one-sided error guarantee, exact mergeability under arbitrary
  * partitionings (counter matrices add element-wise), serialization
  * round-trip, and the shape guards.
  */
class CmsBufferSpec extends AnyFunSuite {

  private def fill(vals: Seq[Long], w: Int, d: Int): CmsBuffer = {
    val b = new CmsBuffer(w, d)
    vals.foreach(b.add)
    b
  }

  test("estimate >= true count always; == for all keys when w is ample") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(500)(rnd.nextInt(40).toLong)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // tight width: one-sided error only
    val tight = fill(vals, 16, 3)
    exact.foreach { case (h, n) => assert(tight.query(h) >= n) }
    // ample width: 40 keys into 4096 buckets x 3 rows — collisions
    // would need the same pair to collide in all 3 Carter-Wegman rows
    val ample = fill(vals, 4096, 3)
    exact.foreach { case (h, n) => assert(ample.query(h) === n) }
    // never-seen key estimates 0 under ample width
    assert(ample.query(999999L) === 0L)
  }

  test("merge of arbitrary partitions == sequential fill, any order") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 30) {
      val w = 16 << rnd.nextInt(4)
      val vals = Seq.fill(rnd.nextInt(300))(rnd.nextInt(1000).toLong)
      val whole = fill(vals, w, 3)
      val cuts = (0 to rnd.nextInt(4))
        .map(_ => rnd.nextInt(vals.length + 1)).sorted
      val slices = (0 +: cuts :+ vals.length).sliding(2)
        .map { case Seq(a, b) => vals.slice(a, b) }.toSeq
      val parts = rnd.shuffle(slices.map(fill(_, w, 3)))
      val acc = new CmsBuffer(0, 0) // merge-side buffer adopts shape
      parts.foreach(acc.merge)
      assert(acc.serialize().toSeq === whole.serialize().toSeq)
      // serialize round-trip is identity (the stored-column contract)
      assert(CmsBuffer.deserialize(acc.serialize()).serialize().toSeq
        === acc.serialize().toSeq)
    }
  }

  test("shape guards: add before adoption and mismatched merges refuse") {
    val empty = new CmsBuffer(0, 0)
    intercept[IllegalArgumentException] { empty.add(1L) }
    val a = fill(Seq(1L), 16, 3)
    val b = fill(Seq(1L), 32, 3)
    intercept[IllegalArgumentException] { a.merge(b) }
  }

  test("inner-product overflow fails loudly instead of wrapping") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.CmsInnerProduct
    import org.apache.spark.sql.types.BinaryType
    val b = new CmsBuffer(16, 1)
    java.util.Arrays.fill(b.counters, 4000000000L) // 4e9² × 16 > 2^63
    val bytes = b.serialize()
    val ex = intercept[ArithmeticException] {
      CmsInnerProduct(Literal(bytes, BinaryType),
        Literal(bytes, BinaryType)).eval(null)
    }
    assert(ex.getMessage.contains("overflow"))
    // well-inside-range inputs still compute exactly
    val small = new CmsBuffer(16, 1)
    java.util.Arrays.fill(small.counters, 3L)
    assert(CmsInnerProduct(Literal(small.serialize(), BinaryType),
      Literal(small.serialize(), BinaryType)).eval(null) === 16L * 9L)
  }

  test("inner product with an empty (unadopted, d=0) sketch is 0, " +
      "not the Long.MaxValue sentinel and not a shape error") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.CmsInnerProduct
    import org.apache.spark.sql.types.BinaryType
    // cms_merge over zero rows serializes w=0,d=0 — the true join size
    // against a key-less sketch is 0, and the row loop must not leave
    // its min-accumulator sentinel behind as the answer
    val empty = Literal(new CmsBuffer(0, 0).serialize(), BinaryType)
    val sized = Literal(fill(Seq(1L, 2L), 16, 3).serialize(), BinaryType)
    assert(CmsInnerProduct(empty, empty).eval(null) === 0L)
    assert(CmsInnerProduct(empty, sized).eval(null) === 0L)
    assert(CmsInnerProduct(sized, empty).eval(null) === 0L)
  }

  test("buckets match the documented Carter-Wegman form") {
    // the q37 oracle re-derives buckets in SQL from these constants;
    // pin them here so a constant change breaks loudly
    val h = (1L << 52) - 17L
    for (j <- 0 until 3) {
      val expect = (((h * CmsBuffer.P(j) + CmsBuffer.B(j)) % CmsBuffer.M)
        % 1024).toInt
      assert(CmsBuffer.bucket(h, j, 1024) === expect)
    }
    assert(CmsBuffer.P.toSeq === Seq(641L, 1097L, 2039L))
    assert(CmsBuffer.B.toSeq === Seq(31L, 277L, 1013L))
    assert(CmsBuffer.M === 2305843009213693951L)
  }
}

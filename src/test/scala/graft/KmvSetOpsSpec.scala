package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.{KmvBuffer, KmvOverlap, KmvSize, KmvUnion}
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Randomized laws of the KMV set-operation scalars against a
  * brute-force model: union bytes are EXACTLY the sketch of the
  * union, overlap counts exactly the co-occurring hashes inside the
  * union's k-min window, size is min(k, distinct). These are the
  * identities that make q35's estimator oracle-checkable.
  */
class KmvSetOpsSpec extends AnyFunSuite {

  private def sketch(vals: Seq[Long], k: Int): Array[Byte] = {
    val b = new KmvBuffer(k)
    vals.foreach(b.add)
    b.serialize()
  }

  private def evalL(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.eval(null)

  test("union/overlap/size match the brute-force model on 100 random " +
      "set pairs with heavy value collisions") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 100) {
      val k = 2 + rnd.nextInt(31)
      // small domain → real overlaps and duplicate adds
      val a = Seq.fill(rnd.nextInt(150))(rnd.nextInt(120).toLong)
      val b = Seq.fill(rnd.nextInt(150))(rnd.nextInt(120).toLong)
      val (sa, sb) = (sketch(a, k), sketch(b, k))
      val la = Literal(sa, BinaryType)
      val lb = Literal(sb, BinaryType)

      // union bytes == sketch of the concatenated inputs
      val union = evalL(KmvUnion(la, lb)).asInstanceOf[Array[Byte]]
      assert(union.toSeq === sketch(a ++ b, k).toSeq)

      // model: k-min windows as plain sorted sets
      val kminA = a.distinct.sorted.take(k).toSet
      val kminB = b.distinct.sorted.take(k).toSet
      val kminU = (a ++ b).distinct.sorted.take(k)
      val expectOverlap =
        kminU.count(h => kminA.contains(h) && kminB.contains(h)).toLong
      assert(evalL(KmvOverlap(la, lb)) === expectOverlap)

      assert(evalL(KmvSize(Literal(union, BinaryType)))
        === kminU.size.toLong)
      assert(evalL(KmvSize(la)) === kminA.size.toLong)
    }
  }

  test("overlap is symmetric and bounded by each side's occupancy") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 20) {
      val k = 4 + rnd.nextInt(12)
      val a = Seq.fill(60)(rnd.nextInt(90).toLong)
      val b = Seq.fill(60)(rnd.nextInt(90).toLong)
      val la = Literal(sketch(a, k), BinaryType)
      val lb = Literal(sketch(b, k), BinaryType)
      val ab = evalL(KmvOverlap(la, lb)).asInstanceOf[Long]
      val ba = evalL(KmvOverlap(lb, la)).asInstanceOf[Long]
      assert(ab === ba)
      assert(ab <= math.min(a.distinct.size, math.min(b.distinct.size, k)))
    }
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinOps
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential test of the as-of operator: small random
  * datasets dense in ties and nulls (keys 0–3, times 0–15, so
  * duplicate (key, time) groups and exact-time probes occur in nearly
  * every case), checked against an executable plain-Scala SPEC of the
  * semantics — every (direction × physical plan × tolerance) cell, with
  * randomized input partitioning. 32 seeded cases ≈ thousands of
  * row-level decisions; the fixture suite pins the named edge cases,
  * this pins everything between them.
  */
class AsOfJoinPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Reference semantics: for a left row (k, t), the matching right id
    * among rows with equal key, time on the direction's side of t and
    * within tolerance — nearest time first, then max id (backward) /
    * min id (forward).
    */
  private def expected(
      left: Seq[(Option[Long], Option[Long], Long)],
      right: Seq[(Option[Long], Option[Long], Long)],
      fwd: Boolean, tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (k, t, id) =>
      val m = (k, t) match {
        case (Some(kk), Some(tt)) =>
          val cands = right.filter { case (rk, rt, _) =>
            rk.contains(kk) && rt.exists { v =>
              val (ok, gap) =
                if (fwd) (v >= tt, v - tt) else (v <= tt, tt - v)
              ok && tol.forall(gap <= _)
            }
          }
          if (cands.isEmpty) None
          else {
            val times = cands.map(_._2.get)
            val bestT = if (fwd) times.min else times.max
            val ids = cands.filter(_._2.get == bestT).map(_._3)
            Some(if (fwd) ids.min else ids.max)
          }
        case _ => None
      }
      id -> m
    }.toMap

  test("32 random tie/null-dense cases match the executable spec in " +
      "every direction × plan × tolerance cell") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def gen(n: Int, idBase: Long): Seq[(Option[Long], Option[Long], Long)] =
      (0 until n).map { i =>
        val k = if (rnd.nextInt(10) == 0) None
                else Some(rnd.nextInt(4).toLong)
        val t = if (rnd.nextInt(12) == 0) None
                else Some(rnd.nextInt(16).toLong)
        (k, t, idBase + i)
      }
    for (c <- 1 to 32) {
      val left = gen(1 + rnd.nextInt(30), 1000L * c)
      val right = gen(1 + rnd.nextInt(30), 1000000L * c)
      val fwd = rnd.nextBoolean()
      val tol = if (rnd.nextBoolean()) Some(rnd.nextInt(6).toLong) else None
      val bcast = Some(rnd.nextBoolean())
      val want = expected(left, right, fwd, tol)

      val lDf = left.toDF("k", "t", "id")
        .repartition(1 + rnd.nextInt(5))
      val rDf = right.toDF("rk", "rt", "rid")
        .repartition(1 + rnd.nextInt(5))
      val join = if (fwd) AsOfJoinOps.asofJoinForward _
                 else AsOfJoinOps.asofJoinBackward _
      val got = join(lDf, rDf, Seq(col("k")), Seq(col("rk")),
          col("t"), col("rt"), Seq(col("rid")), tol, bcast)
        .select(col("id"), col("rid")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got === want,
        s"case $c fwd=$fwd tol=$tol bcast=$bcast\nleft=$left\nright=$right")
    }
  }
}

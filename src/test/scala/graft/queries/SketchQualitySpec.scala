package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Quality CI for the SKETCH family (AnnRecallSpec's discipline,
  * applied to estimators): the oracle proves each sketch computes its
  * DEFINITION bit-exactly, but a sketch can be definition-correct and
  * useless — these gates pin the estimates to the truth they
  * approximate, so a silent quality regression (bad hash mixing, an
  * off-by-one in the k-th order statistic, a bin boundary bug that
  * still round-trips the oracle) fails CI.
  */
class SketchQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  // sf0.01: enough mass per group for the estimators' nominal accuracy
  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("KMV distinct estimate within 20% of exact on EVERY group " +
      "(k=64 → expected RSE ≈ 1/√62 ≈ 13%)") {
    val rows = Registry.byName("q27_kmv_distinct").fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (flag, nExact, errPpm) = (r.getString(0), r.getLong(1),
        r.getAs[Long]("err_ppm"))
      // groups under k are counted exactly (err 0); estimated groups
      // must land inside the 20% band
      assert(errPpm <= 200000L,
        s"KMV group $flag: exact=$nExact err=${errPpm}ppm exceeds 20%")
    }
  }

  test("KMV mergeability law: merging stored fine-grain sketches gives " +
      "the BYTE-identical sketch of the coarse group, estimates within " +
      "20% of exact, and below-k groups are exact") {
    import graft.functions.{VectorFunctions => F}
    val hashed = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        conv(substring(md5(col("l_partkey").cast("string")), 1, 13),
          16, 10).cast("long").as("h"))
    // fine sketches merged up vs the coarse group sketched directly
    val merged = hashed.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(F.kmv_sketch(col("h"), 64).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(F.kmv_merge(col("sk")).as("sk"))
    val direct = hashed.groupBy(col("l_returnflag"))
      .agg(F.kmv_sketch(col("h"), 64).as("sk"))
    val m = merged.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    val dct = direct.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(m === dct, "merged-of-parts != sketch-of-whole")
    // estimates vs exact distinct hashes
    val exact = hashed.select(col("l_returnflag"), col("h")).distinct()
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = direct.select(col("l_returnflag"),
        F.kmv_estimate(col("sk")).as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (g, e) =>
      val n = exact(g)
      assert(math.abs(e - n).toDouble / n <= 0.20,
        s"KMV stored group $g: est=$e exact=$n off by >20%")
    }
    // below-k exactness: tiny groups estimate exactly
    import spark.implicits._
    val tiny = Seq((1, 10L), (1, 20L), (1, 30L), (2, 10L)).toDF("g", "h")
      .groupBy(col("g")).agg(F.kmv_sketch(col("h"), 64).as("sk"))
      .select(col("g"), F.kmv_estimate(col("sk")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(tiny === Map(1 -> 3L, 2 -> 1L))
  }

  test("histogram quantile estimates within two bin widths of the " +
      "exact interpolated percentile — the sketch's construction bound") {
    val est = Registry.byName("q29_histogram_quantiles").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ex = Tables.lineitem(spark, dir).agg(
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.9)"),
      expr("percentile(l_extendedprice, 0.99)"),
      min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
    val width = (ex.getDouble(4) - ex.getDouble(3)) / 1024.0
    for ((pct, idx) <- Seq(50L -> 0, 90L -> 1, 99L -> 2)) {
      val (e, x) = (est(pct), ex.getDouble(idx))
      // est = lower bound of the first bucket reaching p% cumulative
      // mass; the interpolated exact value sits in that bucket or at
      // the edge of its neighbor → within 2 bins by construction
      assert(math.abs(e - x) <= 2.0 * width,
        s"p$pct: est=$e exact=$x width=$width")
    }
  }

  test("sharpness: a 4-bin histogram misses the 2-bin-of-1024 bound " +
      "— the gate measures resolution, not a tautology") {
    val li = Tables.lineitem(spark, dir)
    val mm = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi")).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val n = li.count()
    // 4-bin equi-width p50 estimate, same construction as q29
    val bucketed = li.select(least(floor((col("l_extendedprice") - lo) *
        lit(4.0d) / lit(hi - lo)), lit(3.0d)).cast("long").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .orderBy(col("b")).collect()
    def est4(pct: Long): Double = {
      var cum = 0L
      var res = Double.NaN
      bucketed.foreach { r =>
        if (res.isNaN) {
          cum += r.getLong(1)
          if (cum * 100 >= pct * n)
            res = lo + r.getLong(0) * (hi - lo) / 4.0
        }
      }
      res
    }
    val exact = li.agg(expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.9)"),
      expr("percentile(l_extendedprice, 0.99)")).head()
    val width1024 = (hi - lo) / 1024.0
    // a percentile can land arbitrarily close to a coarse bin floor
    // (p50 does here), so the sharpness claim is over the WORST of the
    // three gated percentiles — at 4-bin resolution at least one must
    // miss the fine bound badly
    val worst = Seq(50L -> 0, 90L -> 1, 99L -> 2).map { case (p, i) =>
      math.abs(est4(p) - exact.getDouble(i))
    }.max
    assert(worst > 2.0 * width1024,
      s"worst 4-bin error $worst vs fine bound ${2.0 * width1024} — a " +
        "resolution this coarse passing would mean the gate tests nothing")
  }

  test("KMV set algebra: at k=256 every pairwise intersection estimate " +
      "lands within 20% of the exact overlap (q35 runs the same " +
      "estimator at k=64; this pins quality at the accuracy tier a " +
      "production store would use)") {
    import graft.functions.{VectorFunctions => F}
    val base = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("p"), col("o_custkey").as("c"),
      conv(substring(md5(col("o_custkey").cast("string")), 1, 13),
        16, 10).cast("long").as("h"))
    val sk = base.groupBy(col("p"))
      .agg(F.kmv_sketch(col("h"), 256).as("sk"))
    val est = sk.select(col("p").as("p1"), col("sk").as("ska"))
      .join(sk.select(col("p").as("p2"), col("sk").as("skb")),
        col("p1") < col("p2"))
      .select(col("p1"), col("p2"),
        expr("kmv_overlap(ska, skb) * kmv_estimate(kmv_union(ska, skb)) " +
          "DIV kmv_size(kmv_union(ska, skb))").as("est_common"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val pc = base.select(col("p"), col("c")).distinct()
    val exact = pc.select(col("p").as("p1"), col("c"))
      .join(pc.select(col("p").as("p2"), col("c")), Seq("c"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (pair, e) =>
      val n = exact(pair)
      assert(math.abs(e - n).toDouble / n <= 0.20,
        s"pair $pair: est_common=$e exact=$n off by >20%")
    }
  }

  test("bottom-k sample quantiles: mergeability law (merged-of-parts " +
      "byte-identical to sketch-of-whole), rank error within the " +
      "sampling band, below-k groups exact") {
    import graft.functions.{VectorFunctions => F}
    val k = 256
    val base = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("p"), col("o_orderstatus").as("st"),
      conv(substring(md5(col("o_orderkey").cast("string")), 1, 13),
        16, 10).cast("long").as("h"),
      expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("x"))
    val merged = base.groupBy(col("p"), col("st"))
      .agg(F.bksample_sketch(col("h"), col("x"), k).as("sk"))
      .groupBy(col("p")).agg(F.bksample_merge(col("sk")).as("sk"))
    val direct = base.groupBy(col("p"))
      .agg(F.bksample_sketch(col("h"), col("x"), k).as("sk"))
    val m = merged.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    val dct = direct.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(m === dct, "merged-of-parts != sketch-of-whole")
    // rank-space band: the empirical CDF position of the estimate must
    // sit within ~4 sampling sds of q (sd = sqrt(q(1-q)/k) ≈ 0.031 at
    // q=0.5, k=256 → band 0.125)
    val perGroup = base.select(col("p"), col("x")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted }
    for ((g, bytes) <- dct; q <- Seq(0.5, 0.9)) {
      val est = org.apache.spark.sql.graft.BkSampleQuantile
        .quantile(bytes.toArray, q).longValue
      val xs = perGroup(g)
      val cdf = xs.count(_ <= est).toDouble / xs.length
      assert(math.abs(cdf - q) <= 0.125,
        s"group $g q=$q: est=$est lands at CDF $cdf")
    }
    // below-k exactness: a tiny group's carried sample IS the group,
    // so the nearest-rank quantile is the exact order statistic
    import spark.implicits._
    val tiny = Seq((1, 10L, 500L), (1, 20L, 100L), (1, 30L, 300L),
        (2, 40L, 700L)).toDF("g", "h", "x")
      .groupBy(col("g"))
      .agg(F.bksample_sketch(col("h"), col("x"), k).as("sk"))
      .select(col("g"), F.bksample_quantile(col("sk"), lit(0.5)).as("q"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(tiny === Map(1 -> 300L, 2 -> 700L))
  }

  test("count-min: one-sided guarantee holds on every q37 probe, point" +
      " overcounts sit inside the e/w·N band, and the q38 join-size " +
      "estimate brackets the true size within e/w·|A||B|") {
    // q37: term frequencies — overcount rides along in the output
    val q37 = Registry.byName("q37_cms_token_freq").fn(spark, dir)
      .collect()
    assert(q37.nonEmpty)
    val nTokens = Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")))
      .count()
    // Cormode-Muthukrishnan: est ≤ true + (e/w)·N w.p. 1−e^−d per
    // probe; data + constants are fixed, so this is a deterministic
    // regression gate, with the bound doubled for union-over-probes
    val band = math.ceil(2 * math.E / 1024.0 * nTokens).toLong
    q37.foreach { r =>
      val over = r.getAs[Long]("overcount")
      assert(over >= 0L,
        s"one-sided guarantee violated on ${r.getString(0)}: $over")
      assert(over <= band,
        s"${r.getString(0)}: overcount $over above the e/w band $band")
    }
    // q38: join-size estimate — one-sided and inside the inner-product
    // error band e/w·‖A‖₁‖B‖₁
    val q38 = Registry.byName("q38_cms_join_size").fn(spark, dir).head()
    val est = q38.getAs[Long]("est_join_size")
    val exact = q38.getAs[Long]("exact_join_size")
    val nA = Tables.orders(spark, dir).count()
    val nB = Tables.lineitem(spark, dir).count()
    val jband = (2 * math.E / 1024.0 * nA * nB).toLong
    assert(est >= exact, s"join-size estimate $est below exact $exact")
    assert(est - exact <= jband,
      s"join-size overcount ${est - exact} above the e/w band $jband")
  }
}

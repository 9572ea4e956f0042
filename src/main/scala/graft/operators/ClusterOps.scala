package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair graphs: turns pairwise
  * candidates (e.g. MinHash-LSH output) into duplicate CLUSTERS
  * (cluster id = smallest member id), the step that makes "keep one per
  * group" possible when duplicates are transitive (A~B, B~C).
  *
  * Distributed min-label propagation: each iteration is one join +
  * min-aggregate keyed by vertex (all shuffles on the small vertex/edge
  * set, never on documents); converges in O(component diameter)
  * iterations — near-dup components are shallow in practice.
  * `localCheckpoint` truncates the iterative lineage (on a cluster,
  * prefer `checkpoint` with a checkpoint dir for fault tolerance).
  */
object ClusterOps {

  /** pairs(id_a, id_b) with id_a < id_b → (doc_id, cluster_id) for
    * every id appearing in a pair.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // `changed` starts at 1, so with maxIter <= 0 the loop never runs
    // and the non-convergence guard below would throw a spurious
    // "did not converge after 0 iterations" even for trivial input
    require(maxIter > 0, s"maxIter must be >= 1, got $maxIter")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
      val next = labels.union(neighborLabels)
        .groupBy(col("id"))
        .agg(min(col("label")).as("next_label"))
        .localCheckpoint(true)
      changed = labels.join(next, "id")
        .filter(col("label") =!= col("next_label")).count()
      labels = next.withColumnRenamed("next_label", "label")
      iter += 1
    }
    // A silently-truncated propagation returns SPLIT clusters — a wrong
    // answer, not a degraded one — so non-convergence is an error.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations " +
          s"($changed labels still changing); raise maxIter — component " +
          "diameter exceeds the iteration budget")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Connected components in O(log n) ROUNDS — the alternating
    * large-star / small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014, public). Same
    * contract as [[connectedComponents]]; different scale envelope:
    * min-label propagation needs O(component diameter) rounds, which
    * on a 100 TB dup graph with chain-shaped components (A~B~C~…,
    * exactly what shingle overlap produces on boilerplate families)
    * can be thousands of joins — star contraction collapses any
    * component in logarithmically many rounds regardless of diameter.
    *
    * Round = two keyed self-joins over the edge set, each a
    * (groupBy min + join) on vertex ids — no driver graph, no
    * quadratic blowup; the edge set only ever SHRINKS (toward the
    * star on each component's minimum).
    *
    *   large-star: for each node u, connect every STRICTLY-LARGER
    *     neighbor v > u to u's minimum neighbor m(u) (m includes u) —
    *     keeps edges only off local minima;
    *   small-star: for each node u, connect every neighbor v <= u
    *     (including u itself) to m(u) — hangs whole stars one level
    *     closer to the component minimum.
    *
    * Converged when the edge multiset is a fixed point: every edge
    * then runs (root, member) with root = component min.
    */
  def connectedComponentsStar(pairs: DataFrame,
      maxRounds: Int = 40): DataFrame = {
    require(maxRounds > 0, s"maxRounds must be >= 1, got $maxRounds")
    // undirected edge set as canonical (lo, hi) rows, self-loops out
    var edges = pairs
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(true)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      // large-star: u's min neighbor (incl. u) pulls u's larger nbrs
      val nbrs = edges
        .select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val m = nbrs.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("mu"))
      val large = nbrs.filter(col("v") > col("u"))
        .join(m, "u")
        .select(least(col("v"), col("mu")).as("lo"),
          greatest(col("v"), col("mu")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
      // small-star over the large-star output: each node u with any
      // smaller neighbor hangs those neighbors AND ITSELF onto
      // m(u) = min(Γ(u) ∪ {u}) (equal to min over the smaller
      // neighbors ∪ {u}, since larger neighbors never win the min)
      val nbrs2 = large
        .select(col("lo").as("u"), col("hi").as("v"))
        .union(large.select(col("hi").as("u"), col("lo").as("v")))
      val m2 = nbrs2.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("mu"))
      val smallSrc = nbrs2.filter(col("v") < col("u"))
      val small = smallSrc
        .union(smallSrc.select(col("u"), col("u").as("v")).distinct())
        .join(m2, "u")
        .select(least(col("v"), col("mu")).as("lo"),
          greatest(col("v"), col("mu")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
        .localCheckpoint(true)
      // fixed point: the canonical edge sets are equal (cheap keyed
      // anti-joins on the SHRINKING edge relation, not the data)
      stable = small.except(edges).isEmpty && edges.except(small).isEmpty
      edges = small
      round += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge after $maxRounds " +
          "rounds; raise maxRounds")
    // fixed point is the star set: every edge is (component min, member)
    edges.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .union(edges.select(col("lo").as("doc_id"), col("lo").as("cluster_id")))
      .distinct()
  }
}

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
}

package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.BpeOps

/** One-off A/B: the r8 nested-fold trainer formulation vs the epoch
  * merge-table formulation, same steps, sf0.01. Throwaway measurement
  * driver for the BpeOps scaladoc numbers.
  */
object BpeTiming {
  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args(0).toInt else 20
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    // nested formulation (r8 code shape): one applyMerge fold per step
    val t0 = System.nanoTime()
    var st = BpeOps.words(docs)
      .select(col("freq"), BpeOps.charSyms(col("w")).as("syms"))
      .persist()
    for (k <- 1 to steps) {
      val top = BpeOps.pairCounts(st)
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      val Array(a, b) = top.head.getString(0).split(" ", 2)
      st = st.withColumn("syms", BpeOps.applyMerge(col("syms"), a, b))
    }
    val t1 = System.nanoTime()
    spark.sharedState.cacheManager.clearCache()

    // epoch formulation
    BpeOps.trainMerges(docs, steps, topK = 1, epochLen = 16).count()
    val t2 = System.nanoTime()

    println(f"BPE_TIMING steps=$steps nested=${(t1 - t0) / 1e9}%.1fs " +
      f"epoch=${(t2 - t1) / 1e9}%.1fs")
    spark.stop()
  }
}

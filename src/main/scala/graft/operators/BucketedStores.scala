package graft.operators

import org.apache.spark.sql.SparkSession

/** Maintenance for the stored bucketed indexes
  * ([[TextDedupOps.writeLshIndex]], [[SimilarityOps.writeIvfIndex]]):
  * every append adds one file per populated bucket, so a store that
  * lives through many snapshot deltas accumulates small files — the
  * classic bucketed-append pathology (scan task count and footer
  * overhead grow with APPEND COUNT, not data size). `compact` rewrites
  * the store once into fresh buckets (back to ~one file per bucket)
  * and swaps it in via a catalog rename, preserving the bucket spec —
  * so probe plans keep their zero-shuffle bucket-aligned scan — and
  * the external location discipline (fresh temp dir; the old location
  * is dropped with the old table).
  *
  * Not crash-atomic across the drop/rename pair (the in-memory
  * catalog has no atomic swap); production on a real metastore would
  * use a transactional RENAME or view flip. The data itself is never
  * at risk: the compacted copy is fully written before the old table
  * is dropped.
  */
object BucketedStores {

  /** Rewrite `table` into a fresh bucketed copy (same bucket/sort
    * spec) and swap it in. Returns the new file count's upper bound
    * input (`buckets`) for convenience in asserts.
    */
  def compact(spark: SparkSession, table: String,
      bucketCols: Seq[String], sortCols: Seq[String], buckets: Int,
      location: Option[String] = None): Unit = {
    val tmp = table + "__compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    val loc = location.getOrElse(
      java.nio.file.Files.createTempDirectory(s"graft_compact_$table")
        .toString)
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val w = spark.table(table)
      // co-locate each BUCKET (not each key) on one writer task →
      // exactly one file per populated bucket: public hash() is
      // Murmur3(seed 42), the same formula V1 bucketing derives the
      // bucket id from, so pmod(hash(cols), buckets) IS the bucket id
      .repartition(buckets, pmod(hash(bucketCols.map(col): _*),
        lit(buckets)))
      .write.bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .option("path", loc)
    w.saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** [[TextDedupOps.writeLshIndex]] store compaction. */
  def compactLshIndex(spark: SparkSession, table: String,
      buckets: Int = 8): Unit =
    compact(spark, table, Seq("band", "bhash"), Seq("band", "bhash"),
      buckets)

  /** [[SimilarityOps.writeIvfIndex]] list compaction (the centroid
    * companion is k rows — nothing to compact).
    */
  def compactIvfIndex(spark: SparkSession, table: String,
      buckets: Int = 8): Unit =
    compact(spark, table, Seq("cid"), Seq("cid"), buckets)
}

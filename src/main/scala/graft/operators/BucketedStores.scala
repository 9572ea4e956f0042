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
  * `compact` is not crash-atomic across its drop/rename pair; the
  * VERSIONED discipline below ([[adoptVersioned]] / [[compactAtomic]])
  * closes that: the served name becomes a view over generation tables
  * and each compaction swap is a single CREATE OR REPLACE VIEW. The
  * data itself is never at risk in either form: the compacted copy is
  * fully written before anything old is dropped.
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

  // ---- Versioned serving: ATOMIC compaction swap -------------------
  //
  // The plain `compact` above has a documented hole: the DROP+RENAME
  // pair is two catalog ops, so a reader resolving the name between
  // them sees a missing table. The versioned discipline closes it:
  // the SERVED name is a VIEW, each physical generation is a table
  // `name__v<k>`, and the swap is ONE catalog op (CREATE OR REPLACE
  // VIEW) — readers resolve either the old generation or the new one,
  // never nothing. A view is plan-level alias only: the probe join
  // still sees the backing table's bucket spec, so the zero-shuffle
  // bucket-aligned scan survives the indirection (CI-gated in
  // OperatorSpecs). Same shape as a metastore view-flip or an
  // Iceberg/Delta pointer swap, built from public Spark catalog ops.

  private def versionOf(backing: String, name: String): Int = {
    val p = name + "__v"
    require(backing.startsWith(p), s"$backing is not a $name generation")
    backing.stripPrefix(p).toInt
  }

  /** The physical table currently served by versioned view `name`. */
  def currentGeneration(spark: SparkSession, name: String): String = {
    val vs = spark.catalog.listTables()
      .collect().map(_.name)
      .filter(_.startsWith(name + "__v"))
    require(vs.nonEmpty, s"$name has no generations — not a versioned store")
    vs.maxBy(versionOf(_, name))
  }

  /** Adopt an existing physical table (e.g. a [[graft.operators
    * .TextDedupOps.writeLshIndex]] output) into versioned serving:
    * rename it to generation 1 and create the serving view. The
    * one-time adoption is the only non-atomic moment (rename + view
    * create); every subsequent [[compactAtomic]] swap is a single
    * catalog op.
    */
  def adoptVersioned(spark: SparkSession, table: String): Unit = {
    val gen1 = table + "__v1"
    spark.sql(s"ALTER TABLE $table RENAME TO $gen1")
    spark.sql(s"CREATE OR REPLACE VIEW $table AS SELECT * FROM $gen1")
  }

  /** The shared tail of every atomic maintenance op: write `content`
    * as the next generation (one file per bucket — the bucket-id
    * repartition — same bucket/sort spec), flip the serving view in
    * ONE catalog op, drop the old generation. A concurrent reader that
    * already resolved the old generation keeps reading its files until
    * the drop; one that resolves during the swap sees exactly one of
    * the two generations.
    */
  private def swapInNextGeneration(spark: SparkSession, name: String,
      old: String, content: org.apache.spark.sql.DataFrame,
      bucketCols: Seq[String], sortCols: Seq[String], buckets: Int,
      location: Option[String]): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val next = name + "__v" + (versionOf(old, name) + 1)
    val loc = location.getOrElse(
      java.nio.file.Files.createTempDirectory(s"graft_gen_$name")
        .toString)
    content
      .repartition(buckets, pmod(hash(bucketCols.map(col): _*),
        lit(buckets)))
      .write.bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .option("path", loc)
      .saveAsTable(next)
    spark.sql(s"CREATE OR REPLACE VIEW $name AS SELECT * FROM $next")
    spark.sql(s"DROP TABLE $old")
  }

  /** Compact a VERSIONED store with an atomic swap: rewrite the
    * current generation into `name__v<k+1>` and flip the serving view
    * ([[swapInNextGeneration]]).
    */
  def compactAtomic(spark: SparkSession, name: String,
      bucketCols: Seq[String], sortCols: Seq[String], buckets: Int,
      location: Option[String] = None): Unit = {
    val old = currentGeneration(spark, name)
    swapInNextGeneration(spark, name, old, spark.table(old),
      bucketCols, sortCols, buckets, location)
  }

  /** Apply a CHANGELOG (deletes and/or upsert additions) to a
    * versioned store with the same atomic-swap discipline as
    * [[compactAtomic]]: the next generation is the current one MINUS
    * every row whose `idCol` appears in `removeIds` PLUS `additions`
    * (an upsert is remove + add), rewritten one-file-per-bucket under
    * the same bucket/sort spec, then flipped in with ONE catalog op.
    * This is the piece append-only maintenance (tx38, dd11's
    * appendToLshIndex) cannot express: a delete has no append-shaped
    * representation in a plain parquet store, so it rides the
    * generation rewrite — the same full-file-rewrite cost a Delta/
    * Iceberg copy-on-write delete pays, amortized the same way
    * (batch changelogs, don't flip per row).
    *
    * `removeIds` is changelog-scale: the anti-join broadcasts it when
    * small (AQE's call) while the store side stays an unshuffled
    * bucket-aligned scan feeding the bucket-preserving repartition.
    */
  def applyDeltaAtomic(spark: SparkSession, name: String,
      bucketCols: Seq[String], sortCols: Seq[String], buckets: Int,
      idCol: String, removeIds: org.apache.spark.sql.DataFrame,
      additions: Option[org.apache.spark.sql.DataFrame],
      location: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val old = currentGeneration(spark, name)
    val kept = spark.table(old)
      .join(removeIds.select(col(idCol)).distinct(), Seq(idCol),
        "left_anti")
    val content = additions.fold(kept)(a =>
      kept.unionByName(a.select(kept.columns.map(col).toSeq: _*)))
    swapInNextGeneration(spark, name, old, content,
      bucketCols, sortCols, buckets, location)
  }

  /** [[applyDeltaAtomic]] for EDGE stores — rows that reference TWO
    * document ids (`idColA`, `idColB`, e.g. a verified near-dup pair
    * set): a changed document invalidates every edge it touches on
    * EITHER end, so the kept set anti-joins on both columns before the
    * additions union and the same one-view-flip swap.
    */
  def applyEdgeDeltaAtomic(spark: SparkSession, name: String,
      bucketCols: Seq[String], sortCols: Seq[String], buckets: Int,
      idColA: String, idColB: String,
      removeIds: org.apache.spark.sql.DataFrame,
      additions: Option[org.apache.spark.sql.DataFrame],
      location: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val old = currentGeneration(spark, name)
    val ids = removeIds.columns match {
      case Array(c) => removeIds.select(col(c).as("_rm_id")).distinct()
      case cs => sys.error(
        s"removeIds must be a single id column, got ${cs.mkString(",")}")
    }
    val kept = spark.table(old)
      .join(ids, col(idColA) === col("_rm_id"), "left_anti")
      .join(ids, col(idColB) === col("_rm_id"), "left_anti")
    val content = additions.fold(kept)(a =>
      kept.unionByName(a.select(kept.columns.map(col).toSeq: _*)))
    swapInNextGeneration(spark, name, old, content,
      bucketCols, sortCols, buckets, location)
  }

  /** Remove a versioned store (serving view + every generation), plus
    * any plain pre-adoption table of the same name — the per-run reset
    * for queries that MUTATE their store each invocation (tx38's
    * rebuild-per-run discipline needs it once deletes enter: the
    * mutation is no longer idempotent-by-append).
    */
  def dropVersioned(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP VIEW IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(name + "__v"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** [[compactAtomic]] with the LSH-index bucket spec. */
  def compactLshIndexAtomic(spark: SparkSession, name: String,
      buckets: Int = 8): Unit =
    compactAtomic(spark, name, Seq("band", "bhash"),
      Seq("band", "bhash"), buckets)

  /** [[SimilarityOps.writeIvfIndex]] list compaction (the centroid
    * companion is k rows — nothing to compact).
    */
  def compactIvfIndex(spark: SparkSession, table: String,
      buckets: Int = 8): Unit =
    compact(spark, table, Seq("cid"), Seq("cid"), buckets)
}

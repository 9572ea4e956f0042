package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CmsBuffer, CmsInnerProduct}
import org.apache.spark.sql.types.BinaryType

/** Sketch statistics that travel with a stored table — the stats tier
  * behind [[graft.plans.SketchJoinRule]]'s planning decisions.
  *
  * A 100 TB engine can't afford `ANALYZE TABLE` rescans to keep join
  * planning honest, and Spark's own size estimate for a catalog table
  * is bytes-on-disk — blind to key distribution, so it can neither
  * estimate a join's OUTPUT size nor notice a key that fans out. The
  * graft stores are written by the engine's own writers, so statistics
  * are maintained where they're cheapest: one scan at write time
  * produces a 24 KB count-min sketch of the join key (mergeable, so
  * incremental writers can maintain it delta-only, q39's lifecycle),
  * the exact row count, and the scan-relation size estimate. From two
  * such rows any equi-join's output cardinality is answered in
  * microseconds from bytes (Cormode & Muthukrishnan §4.2, the q38
  * estimator) — no data scanned, no cluster touched.
  *
  * Stored as a one-row table `<table>__kstats` next to the store, same
  * catalog-visibility discipline as the `__v<k>` generations; a
  * driver-side cache makes repeated planner consultations free and is
  * invalidated by [[analyzeKey]] (same-session rewrites) and
  * [[invalidate]].
  *
  * Reference parity note: the reference pipeline
  * (CI-CMG/wod-ascii-to-parquet-spark) has no stats or planning tier;
  * this follows the public lakehouse pattern (Iceberg's Puffin stat
  * files, Delta's table stats) re-expressed with engine sketches.
  */
object SketchStats {

  /** One table's key statistics: exact row count, the planner's size
    * estimate at analyze time, the count-min sketch of the key's
    * engine-convention 52-bit md5 hash, and the highest streaming
    * batch id already folded in (-1 = none; the [[applyDelta]]
    * idempotence guard for at-least-once `foreachBatch` delivery).
    */
  final case class KeyStats(table: String, keyCol: String, nRows: Long,
      sizeBytes: Long, cms: Array[Byte], lastBatch: Long = -1L)

  def statsTableOf(table: String): String = table + "__kstats"

  private val cache = new ConcurrentHashMap[String, Option[KeyStats]]()

  /** Build (or rebuild) `table`'s key stats with ONE scan: exact count
    * + cms_sketch over the engine's 52-bit md5 key hash. `sizeBytes`
    * records the relation's optimizer size estimate so the planning
    * rule can make the broadcast call without touching the filesystem
    * per query. w=1024, d=3 is the q37/q38 shape: 24 KB, ε = e/1024.
    */
  def analyzeKey(spark: SparkSession, table: String, keyCol: String,
      w: Int = 1024, d: Int = 3): KeyStats = {
    val df = spark.table(table)
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
    val row = df
      .select(conv(substring(md5(col(keyCol).cast("string")), 1, 13),
        16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.VectorFunctions.cms_sketch(col("h"), w, d)
          .as("cms"))
      .head()
    val stats = KeyStats(table, keyCol, row.getLong(0), sizeBytes,
      row.getAs[Array[Byte]](1))
    persist(spark, stats)
    stats
  }

  private def persist(spark: SparkSession, stats: KeyStats): Unit = {
    import spark.implicits._
    Seq((stats.keyCol, stats.nRows, stats.sizeBytes, stats.cms,
      stats.lastBatch))
      .toDF("key_col", "n_rows", "size_bytes", "cms", "last_batch")
      .write.mode("overwrite")
      .option("path",
        java.nio.file.Files.createTempDirectory("graft_kstats").toString)
      .saveAsTable(statsTableOf(stats.table))
    cache.put(stats.table, Some(stats))
  }

  /** The stored stats for `table`, or None when it has none — the
    * planning rule's stand-down signal. Cached per driver; a MISS
    * (no stats table) is cached too, so un-statted tables cost one
    * catalog probe per session, not one per query.
    */
  def read(spark: SparkSession, table: String): Option[KeyStats] = {
    val cached = cache.get(table)
    if (cached != null) return cached
    val loaded =
      if (!spark.catalog.tableExists(statsTableOf(table))) None
      else {
        val r = spark.table(statsTableOf(table)).head()
        Some(KeyStats(table, r.getString(0), r.getLong(1), r.getLong(2),
          r.getAs[Array[Byte]](3), r.getLong(4)))
      }
    cache.put(table, loaded)
    loaded
  }

  def invalidate(table: String): Unit = { cache.remove(table): Unit }

  /** DELTA-ONLY stats maintenance — the reason the stats tier survives
    * 100 TB: when a store's changelog applies (appends and/or deletes
    * of KNOWN rows), the key sketch updates from the delta alone.
    * Counter matrices are linear in the input multiset (fixed
    * Carter–Wegman buckets), so
    *
    *   cms(corpus + added − deleted) = cms(corpus) + cms(added)
    *                                   − cms(deleted)
    *
    * holds EXACTLY — the maintained stats are byte-equal to a
    * from-scratch [[analyzeKey]] rescan (spec-gated), at delta cost.
    * `added`/`deleted` carry the analyzed key column; `deleted` must
    * be rows the store actually held (a negative counter fails loudly
    * — [[org.apache.spark.sql.graft.CmsBuffer.subtract]]). The size
    * estimate re-reads the relation's (file-size) stats — a metadata
    * call, not a scan.
    *
    * `batchId` is the streaming idempotence guard: `foreachBatch`
    * delivers at-least-once, and a double-applied delta would corrupt
    * the counters silently — with a batch id, a replayed batch is a
    * no-op (stats remember the highest id folded in). Batch ids must
    * arrive non-decreasing (Structured Streaming's contract).
    */
  def applyDelta(spark: SparkSession, table: String,
      added: Option[DataFrame], deleted: Option[DataFrame],
      batchId: Option[Long] = None): KeyStats = {
    val old = read(spark, table).getOrElse(sys.error(
      s"$table has no key stats — analyzeKey first"))
    if (batchId.exists(_ <= old.lastBatch)) return old // replay: no-op
    val buf = CmsBuffer.deserialize(old.cms)
    require(buf.w > 0 && buf.d > 0,
      s"$table stats sketch has no shape — re-run analyzeKey")
    val (w0, d0) = (buf.w, buf.d)
    def deltaSketch(df: DataFrame): (Long, CmsBuffer) = {
      val r = df
        .select(conv(substring(md5(col(old.keyCol).cast("string")), 1, 13),
          16, 10).cast("long").as("h"))
        .agg(count(lit(1)).as("n"),
          graft.functions.VectorFunctions.cms_sketch(col("h"), w0, d0)
            .as("cms"))
        .head()
      (r.getLong(0), CmsBuffer.deserialize(r.getAs[Array[Byte]](1)))
    }
    var n = old.nRows
    added.foreach { a =>
      val (na, sk) = deltaSketch(a); n += na; buf.merge(sk)
    }
    deleted.foreach { dd =>
      val (nd, sk) = deltaSketch(dd); n -= nd; buf.subtract(sk)
    }
    require(n >= 0, s"$table stats: row count went negative ($n)")
    val sizeBytes = spark.table(table).queryExecution.optimizedPlan
      .stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong
    val stats = KeyStats(table, old.keyCol, n, sizeBytes, buf.serialize(),
      batchId.getOrElse(old.lastBatch))
    persist(spark, stats)
    stats
  }

  /** Estimated |A ⋈ B| on the sketched keys — the q38 estimator over
    * stored bytes: min over rows j of Σ_b A_j[b]·B_j[b]. One-sided
    * (≥ exact); exact arithmetic that fails loudly on overflow
    * (CmsInnerProduct's contract). Driver-side, microseconds.
    */
  def estimateJoinRows(a: KeyStats, b: KeyStats): Long =
    CmsInnerProduct(Literal(a.cms, BinaryType), Literal(b.cms, BinaryType))
      .eval(null).asInstanceOf[Long]

  /** Sanity accessor used by specs: deserialized sketch shape. */
  private[graft] def shapeOf(s: KeyStats): (Int, Int) = {
    val b = CmsBuffer.deserialize(s.cms)
    (b.w, b.d)
  }
}

package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogTableType, CreateTableEvent, DropTableEvent, ExternalCatalogEvent, ExternalCatalogEventListener, RenameTableEvent}
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
  * Stored as a one-row table `<table>__kstats` co-located next to the
  * analyzed table's own directory (falling back to a managed warehouse
  * table when the analyzed name has no filesystem location, e.g. a
  * versioned-store serving view) — planner stats must survive a JVM
  * restart and must not orphan a directory per rewrite.
  *
  * IDENTITY is the fully-qualified `db.table` name: an unqualified
  * caller resolves against the session's CURRENT database, exactly as
  * table resolution would, so `GRAFT ANALYZE db.t` and a same-named
  * table in another database can never collide. A driver-side cache
  * makes repeated planner consultations free; it is invalidated by
  * [[analyzeKey]]/[[invalidate]] AND by catalog events (a DROP or
  * re-CREATE of an analyzed table marks its stats STALE — the rule
  * stands down until a fresh analyze, never plans on a ghost).
  *
  * Reference parity note: the reference pipeline
  * (CI-CMG/wod-ascii-to-parquet-spark) has no stats or planning tier;
  * this follows the public lakehouse pattern (Iceberg's Puffin stat
  * files, Delta's table stats) re-expressed with engine sketches.
  */
object SketchStats extends org.apache.spark.internal.Logging {

  /** One table's key statistics: exact row count, the planner's size
    * estimate at analyze time, the count-min sketch of the key's
    * engine-convention 52-bit md5 hash, the highest streaming batch id
    * already folded in (-1 = none), and the LINEAGE that batch id is
    * scoped to (the streaming checkpoint identity — batch ids restart
    * at 0 for every fresh checkpoint, so an id is only meaningful
    * within its lineage; "" = batch-API maintenance, no lineage).
    */
  final case class KeyStats(table: String, keyCol: String, nRows: Long,
      sizeBytes: Long, cms: Array[Byte], lastBatch: Long = -1L,
      lineage: String = "")

  def statsTableOf(table: String): String = table + "__kstats"

  /** `db.table`, resolving an unqualified name against the session's
    * current database — the same resolution a table reference gets.
    */
  def qualify(spark: SparkSession, table: String): String = {
    val t = table.toLowerCase(java.util.Locale.ROOT)
    if (t.contains(".")) t
    else spark.sessionState.catalog.getCurrentDatabase + "." + t
  }

  // Cache and stale-mark keys are SCOPED TO THE CATALOG INSTANCE
  // (identity hash prefix): the maps are JVM-global but a catalog dies
  // with its session, and a fresh session re-creating a same-named
  // table must never read a dead session's cached stats.
  private val cache = new ConcurrentHashMap[String, Option[KeyStats]]()
  // qualified base names whose stored stats a catalog event declared
  // stale (table dropped/renamed/re-created out-of-band): read() serves
  // None for these — stand down — until a fresh analyze/persist clears
  // the mark. The stats TABLE itself is left for the next persist to
  // overwrite; internal content-preserving maintenance reads through
  // the mark via readStored.
  private val stale =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // Scope token per catalog instance: a UUID held in a WEAK-keyed map
  // (identityHashCode is not collision-free — two catalogs in one JVM
  // could share a hash and bleed cached stats across sessions; a UUID
  // cannot collide, and the weak key lets a closed session's catalog
  // be collected so its entries become purgeable).
  private val scopeTokens = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, String]())

  private def scopeOf(cat: AnyRef): String =
    scopeTokens.synchronized {
      val t = scopeTokens.get(cat)
      if (t != null) t
      else {
        val fresh = java.util.UUID.randomUUID().toString
        scopeTokens.put(cat, fresh)
        fresh
      }
    }

  private def catScope(spark: SparkSession): String =
    scopeOf(spark.sharedState.externalCatalog)

  private def keyOf(spark: SparkSession, q: String): String =
    catScope(spark) + "/" + q
  // externalCatalog instances already carrying our invalidation hook —
  // weak-keyed for the same reason as scopeTokens: a hooked set that
  // strong-refs catalogs would pin every dead session's catalog (and
  // its scope token) in memory forever
  private val hooked = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]()))

  /** Evict cache/stale entries whose catalog died: once a catalog is
    * garbage-collected its weak token entry vanishes, so any cached
    * key carrying a no-longer-live scope prefix is unreachable garbage.
    * Ran whenever a NEW catalog registers (session churn is exactly
    * when dead-scope entries accumulate).
    */
  private def purgeDeadScopes(): Unit = {
    val live = scopeTokens.synchronized {
      val out = scala.collection.mutable.Set.empty[String]
      scopeTokens.values().forEach(v => { out += v; () })
      out.toSet
    }
    def dead(k: String): Boolean = {
      val cut = k.indexOf('/')
      cut > 0 && !live.contains(k.substring(0, cut))
    }
    cache.keySet().removeIf(k => dead(k))
    stale.removeIf(k => dead(k))
  }

  /** Register the catalog-event invalidation hook once per shared
    * external catalog: DROP / RENAME / re-CREATE of an analyzed table
    * poisons its cached stats (stand-down), and any event on a
    * `__kstats` table itself just evicts the base's cache entry so the
    * next read reloads from storage. Events post synchronously on the
    * mutating thread, so the cache can never serve a pre-drop row
    * after the drop returns.
    */
  private def ensureInvalidationHook(spark: SparkSession): Unit = {
    val cat = spark.sharedState.externalCatalog
    if (hooked.add(cat)) {
      purgeDeadScopes()
      val scope = scopeOf(cat)
      cat.addListener(new ExternalCatalogEventListener {
        override def onEvent(event: ExternalCatalogEvent): Unit = {
          def touch(db: String, name: String, poison: Boolean): Unit = {
            val key = scope + "/" + db + "." + name
            if (name.endsWith("__kstats")) {
              cache.remove(scope + "/" + db + "." +
                name.stripSuffix("__kstats")): Unit
            } else {
              cache.remove(key)
              if (poison) stale.add(key): Unit else ()
            }
          }
          event match {
            case e: DropTableEvent => touch(e.database, e.name, true)
            case e: CreateTableEvent => touch(e.database, e.name, true)
            case e: RenameTableEvent =>
              touch(e.database, e.name, true)
              touch(e.database, e.newName, true)
            case _ => ()
          }
        }
      })
    }
  }

  /** Build (or rebuild) `table`'s key stats with ONE scan: exact count
    * + cms_sketch over the engine's 52-bit md5 key hash. `sizeBytes`
    * records the relation's optimizer size estimate so the planning
    * rule can make the broadcast call without touching the filesystem
    * per query. w=1024, d=3 is the q37/q38 shape: 24 KB, ε = e/1024.
    *
    * Analyzing a VERSIONED STORE's serving name also snapshots the
    * stats onto its current GENERATION table (the relation the
    * optimizer actually sees once the view expands — and the one a
    * `VERSION AS OF` read resolves to), unless the store is
    * merge-on-read (tombstones make generation content differ from
    * served content, so a generation-level sketch would overstate it).
    *
    * `location` overrides where the `__kstats` table's files live;
    * default co-locates next to the analyzed table's own directory.
    */
  def analyzeKey(spark: SparkSession, table: String, keyCol: String,
      w: Int = 1024, d: Int = 3,
      location: Option[String] = None): KeyStats = {
    val q = qualify(spark, table)
    val df = spark.table(q)
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
    val row = df
      .select(conv(substring(md5(col(keyCol).cast("string")), 1, 13),
        16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.VectorFunctions.cms_sketch(col("h"), w, d)
          .as("cms"))
      .head()
    val stats = KeyStats(q, keyCol, row.getLong(0), sizeBytes,
      row.getAs[Array[Byte]](1))
    persist(spark, stats, location)
    snapshotToCurrentGeneration(spark, q, stats)
    stats
  }

  /** If `q` is a versioned-store serving view (and not merge-on-read),
    * copy its fresh stats onto the current generation table — count and
    * sketch are identical by construction; sizeBytes re-reads the
    * generation relation's own estimate.
    */
  private def snapshotToCurrentGeneration(spark: SparkSession, q: String,
      stats: KeyStats): Unit = q.split('.') match {
    // generation discovery lists the CURRENT database — a store in
    // another db (or under a multi-part catalog.db.t name, which has
    // no versioned-store generations) keeps its view-level stats only
    case Array(db, bare)
        if db == spark.sessionState.catalog.getCurrentDatabase =>
      val gen = scala.util.Try(
        BucketedStores.currentGeneration(spark, bare)).toOption
      val isMor = scala.util.Try(
        BucketedStores.currentTombstones(spark, bare)).isSuccess
      gen.filter(_ => !isMor).foreach { g =>
        copyTo(spark, stats, g)
      }
    case _ => ()
  }

  /** Persist `stats` under table name `to` (a generation snapshot):
    * same count/sketch, sizeBytes re-read from `to`'s own relation.
    */
  private[graft] def copyTo(spark: SparkSession, stats: KeyStats,
      to: String): Unit = {
    val qTo = qualify(spark, to)
    val sizeBytes = scala.util.Try(
      spark.table(qTo).queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong).getOrElse(stats.sizeBytes)
    persist(spark, stats.copy(table = qTo, sizeBytes = sizeBytes))
  }

  /** Durable stats location: next to the analyzed table's own
    * directory (`<dir>__kstats` — deterministic, so an overwrite
    * reuses it instead of orphaning the old one). Views and pathless
    * relations get a deterministic warehouse-adjacent dir instead —
    * still EXTERNAL (a managed table would refuse to re-create over a
    * dead JVM's leftover directory; an external overwrite just
    * truncates it).
    */
  private def defaultLocation(spark: SparkSession,
      qTable: String): String = {
    val fromBase = scala.util.Try {
      val Array(db, t) = qTable.split('.')
      val meta = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(t, Some(db)))
      if (meta.tableType == CatalogTableType.VIEW) None
      else Option(meta.location).map(_.toString.stripSuffix("/") +
        "__kstats")
    }.toOption.flatten
    fromBase.getOrElse(
      spark.sessionState.conf.warehousePath.stripSuffix("/") +
        "/graft_kstats/" + qTable + "__kstats")
  }

  private def persist(spark: SparkSession, stats: KeyStats,
      location: Option[String] = None): Unit = {
    import spark.implicits._
    ensureInvalidationHook(spark)
    val w = Seq((stats.keyCol, stats.nRows, stats.sizeBytes, stats.cms,
      stats.lastBatch, stats.lineage))
      .toDF("key_col", "n_rows", "size_bytes", "cms", "last_batch",
        "lineage")
      .write.mode("overwrite")
    w.option("path",
        location.getOrElse(defaultLocation(spark, stats.table)))
      .saveAsTable(statsTableOf(stats.table))
    stale.remove(keyOf(spark, stats.table))
    cache.put(keyOf(spark, stats.table), Some(stats))
  }

  /** The stored stats for `table`, or None when it has none (or a
    * catalog event marked them stale) — the planning rule's
    * stand-down signal. Cached per driver; a MISS (no stats table) is
    * cached too, so un-statted tables cost one catalog probe per
    * session, not one per query.
    */
  def read(spark: SparkSession, table: String): Option[KeyStats] = {
    ensureInvalidationHook(spark)
    val q = qualify(spark, table)
    val key = keyOf(spark, q)
    if (stale.contains(key)) return None
    val cached = cache.get(key)
    if (cached != null) return cached
    val loaded = readStored(spark, q)
    cache.put(key, loaded)
    loaded
  }

  /** Direct storage read, bypassing cache AND the stale mark —
    * internal maintenance that KNOWS content was preserved (a
    * compaction rewrite fires drop/rename events that poison the mark,
    * but the counts/sketch stay exact) reads through it and
    * re-persists.
    */
  private[graft] def readStored(spark: SparkSession,
      table: String): Option[KeyStats] = {
    val q = qualify(spark, table)
    if (!spark.catalog.tableExists(statsTableOf(q))) None
    else scala.util.Try {
      // schema-tolerant decode: `last_batch`/`lineage` arrived after
      // the first stats tables were written, and stats are durable by
      // design — a pre-upgrade 5-column row must decode (defaults),
      // and ANY malformed stats table must degrade to stand-down
      // (None), never crash the planner read path
      val r = spark.table(statsTableOf(q)).head()
      val fields = r.schema.fieldNames.toSet
      KeyStats(q, r.getAs[String]("key_col"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("size_bytes"),
        r.getAs[Array[Byte]]("cms"),
        if (fields.contains("last_batch")) r.getAs[Long]("last_batch")
        else -1L,
        if (fields.contains("lineage")) r.getAs[String]("lineage")
        else "")
    } match {
      case scala.util.Success(st) => Some(st)
      case scala.util.Failure(e) =>
        logWarning(s"[GRAFT_STATS] ${statsTableOf(q)} is unreadable " +
          s"(${e.getMessage}) — standing down; re-run GRAFT ANALYZE")
        None
    }
  }

  def invalidate(table: String): Unit = {
    // over-invalidation is safe (one extra storage read): without a
    // session we can't resolve the scope or current database, so evict
    // every entry whose qualified name could refer to `table`
    val t = table.toLowerCase(java.util.Locale.ROOT)
    val suffix = if (t.contains(".")) "/" + t else "." + t
    val it = cache.keySet().iterator()
    while (it.hasNext) { if (it.next().endsWith(suffix)) it.remove() }
  }

  /** Drop `table`'s stored stats entirely — the stand-down marker the
    * store maintenance paths use when a rewrite changes content they
    * cannot price delta-only: a stale `sizeBytes`/sketch on a store
    * that grew 100× is exactly the runaway broadcast the planning rule
    * exists to prevent, so maintained-but-unpriced stats must die, not
    * linger.
    */
  def dropStats(spark: SparkSession, table: String): Unit = {
    val q = qualify(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS ${statsTableOf(q)}")
    stale.remove(keyOf(spark, q))
    cache.put(keyOf(spark, q), None): Unit
  }

  /** Content-preserving refresh: the table was rewritten (compaction)
    * with identical rows, so count/sketch stay exact and only the
    * relation's size estimate is re-read. Reads through the stale mark
    * (the rewrite's own drop/rename events set it) and re-persists.
    * No-op when the table was never analyzed.
    */
  def refreshSize(spark: SparkSession, table: String): Unit = {
    val q = qualify(spark, table)
    readStored(spark, q).foreach { old =>
      val sizeBytes = spark.table(q).queryExecution.optimizedPlan
        .stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong
      persist(spark, old.copy(sizeBytes = sizeBytes))
    }
  }

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
    * arrive non-decreasing (Structured Streaming's contract) — WITHIN
    * ONE LINEAGE: ids are scoped to a checkpoint, and a fresh
    * checkpoint restarts them at 0, so callers pass the checkpoint
    * identity as `lineage`. A batch from a NEW lineage always applies
    * (and re-scopes the guard); only a same-lineage id at or below the
    * recorded high-water is a replay. Omitting `lineage` keeps the
    * previous scope — the batch-API form.
    */
  def applyDelta(spark: SparkSession, table: String,
      added: Option[DataFrame], deleted: Option[DataFrame],
      batchId: Option[Long] = None,
      lineage: Option[String] = None): KeyStats = {
    val q = qualify(spark, table)
    // maintenance reads THROUGH the stale mark (readStored): the mark
    // guards the planner path; a maintainer folding a delta it has in
    // hand is the party that makes stats fresh again
    val old = readStored(spark, q).getOrElse(sys.error(
      s"$q has no key stats — analyzeKey first"))
    val sameLineage = lineage.forall(_ == old.lineage)
    if (sameLineage && batchId.exists(_ <= old.lastBatch))
      return old // replay within this lineage: no-op
    val buf = CmsBuffer.deserialize(old.cms)
    require(buf.w > 0 && buf.d > 0,
      s"$q stats sketch has no shape — re-run analyzeKey")
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
    require(n >= 0, s"$q stats: row count went negative ($n)")
    val sizeBytes = spark.table(q).queryExecution.optimizedPlan
      .stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong
    val stats = KeyStats(q, old.keyCol, n, sizeBytes, buf.serialize(),
      if (sameLineage) batchId.getOrElse(old.lastBatch)
      else batchId.getOrElse(-1L),
      lineage.getOrElse(old.lineage))
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

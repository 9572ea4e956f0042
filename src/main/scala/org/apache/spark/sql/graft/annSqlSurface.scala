/** SQL surface for stored-index ANN serving.
  *
  * The similarity tier's stored IVF indexes
  * ([[graft.operators.SimilarityOps.writeIvfIndex]] — cid-bucketed
  * inverted lists + a k-row centroid companion) were API-only while
  * as-of joins, time travel, and the maintenance verbs all gained SQL
  * spellings. This closes the asymmetry with a table-valued macro in
  * the same delegating-parser discipline:
  *
  *   SELECT * FROM GRAFT_ANN('<index>', '<queries_table>', <k>, <nprobe>)
  *   SELECT * FROM GRAFT_ANN('<sq8_index>', '<queries>', <k>, <nprobe>, <rerank>)
  *
  * expands AT PARSE TIME into the stock-grammar derived table that
  * probes the stored index. The 4-arg form serves float IVF stores
  * ([[graft.operators.SimilarityOps.writeIvfIndex]]); the 5-arg form
  * serves QUANTIZED stores, dispatched on the lists' schema with
  * loud errors on a missing/extra rerank:
  *
  *  - (q, amax) rows → IVF-SQ8 ([[graft.operators.SimilarityOps
  *    .writeIvfSq8Index]]): int8 scan kernel (`array_dot_q8`), in-row
  *    query quantization (`int8_quantize`), exact-float re-rank off
  *    the `_vecs` companion — identical to [[graft.operators
  *    .SimilarityOps.probeIvfSq8Index]];
  *  - (codes) rows WITHOUT cid → flat PQ ([[graft.operators
  *    .SimilarityOps.writePqIndex]]): whole-corpus asymmetric-
  *    distance scan through the codegen'd `pq_adc` kernel (nprobe
  *    pinned to 1 — no coarse lists);
  *  - (cid, codes) rows → IVF-PQ ([[graft.operators.SimilarityOps
  *    .writeIvfPqIndex]]): nprobe probed code lists + `pq_adc` +
  *    exact re-rank — identical to [[graft.operators.SimilarityOps
  *    .probeIvfPqIndex]], the scale-safe PQ layout.
  *
  * The float form is semantically identical to
  * [[graft.operators.SimilarityOps.probeIvfIndex]] (same rounded-
  * cosine probe selection `(cos DESC, cid)`, same candidate scoring,
  * same `(score DESC, id)` tie-break), generalized to top-k. Output
  * columns: `id_a, ann_id, score, rank` (rank 1..k per query).
  *
  * The expansion is pure SQL over the engine's registered kernels
  * (`array_dot`, `array_norm` — native codegen'd expressions), so the
  * plan is exactly the API plan class: the corpus-scale inverted lists
  * come off the bucket-aligned scan, only the (query × nprobe)-scale
  * side shuffles, and the k-row centroid companion joins broadcast.
  * The SQL form trades probeIvfIndex's centroid literal for a
  * broadcast join (same bytes), and mirrors the API path's probed-
  * list pruning: ONE bounded parse-time aggregate (the macro twin of
  * `probeRegime`) resolves the union of all queries' probed cids and
  * injects it as an `IN` filter on the lists join, so the unprobed
  * lists' bytes stay unread on the SQL surface too (cid-bucket +
  * row-group pruning). Over the cap (corpus-as-queries) or on any
  * resolution failure the filter is simply omitted — results are
  * identical either way. View definitions (`CREATE VIEW … GRAFT_ANN`)
  * never bake the content-dependent In-list into their stored text.
  *
  * Contract (documented, loudly enforced): the queries relation
  * exposes `vec_id` and `embedding` (the engine's embedding-table
  * shape); the index store and its `_centroids` companion must exist
  * in the catalog at parse time. A merge-on-read index store works
  * unchanged — `<index>` resolves to its serving view, so tombstoned
  * vectors are already subtracted. TIME TRAVEL composes: a retained
  * index generation (`GRAFT_ANN('idx__v1', …)`) probes the historical
  * lists against that generation's SNAPSHOTTED centroid companion
  * (`idx__v1_centroids`, pinned at swap time by
  * [[graft.operators.BucketedStores]]). List maintenance never
  * retrains the quantizer, but a later FULL REBUILD (`writeIvfIndex`
  * re-run, streamed index rebuild) drops and retrains the BASE
  * companion while retained generations survive — so the resolver
  * never falls back from a generation name to the base companion: a
  * generation without its snapshot fails loudly instead of silently
  * probing old lists against a possibly-retrained quantizer. The
  * SQ8 tier time-travels the same way — a quantized generation needs
  * BOTH of its snapshots (`idx__v1_centroids` AND `idx__v1_vecs`,
  * the float rerank companion pinned as a shallow catalog snapshot),
  * and every lists/companion pairing is additionally checked for a
  * matching quantizer BUILD STAMP before serving.
  *
  * Reference parity note: the reference pipeline
  * (CI-CMG/wod-ascii-to-parquet-spark) has no similarity tier; the
  * table-valued-function shape follows the public warehouse dialects
  * (DuckDB/BigQuery TVFs, pgvector's SQL serving).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSession}

object GraftAnnRewrite {
  import AsOfSqlLexer._

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_ANN] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  private val ArgShape =
    ("""^\s*'([A-Za-z0-9_.]+)'\s*,\s*'([A-Za-z0-9_.]+)'\s*,""" +
      """\s*(\d+)\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?$""").r

  /** A statement whose expansion text OUTLIVES this parse (a view
    * definition) must not bake in content-dependent fragments: the
    * probed-cid In-list below reflects the queries table AS OF parse
    * time, and a stored view would keep serving that stale list.
    */
  private val ViewDef =
    """^\s*CREATE\s+(OR\s+REPLACE\s+)?(TEMP(ORARY)?\s+)?(GLOBAL\s+)?VIEW"""
      .r.unanchored

  /** Parse-time twin of the API probes' `probeRegime`: a trivial
    * bounded count decides the regime, then (bounded batches only)
    * ONE bounded aggregate resolves the UNION of all queries' nprobe
    * probed lists (capped at GatherMaxQueries × nprobe exploded rows —
    * over the cap means corpus-as-queries, where essentially every
    * list is probed and there is nothing to prune), so the expansion
    * can inject an `IN (<cids>)` filter that reaches the lists scan
    * as a pushed filter — cid-bucket pruning plus parquet row-group
    * pruning drop the unprobed lists' bytes, exactly like the API
    * path's In-filter. The centroid RANKING RULE is character-for-
    * character the expansions' probe rule, so the resolved set can
    * never exclude a list the expansion would probe. Any failure
    * (unresolvable queries relation, streaming source, cap hit)
    * falls back to the unfiltered join — pruning is an optimization,
    * never a correctness dependency. Content-dependence caveat: the
    * set reflects the queries table at parse time; a row appended
    * between parse and execution of the SAME statement is still
    * served (it is a query-side row), but its probed lists must
    * already be in the set — the API probes share this property
    * (probeRegime runs before the scan job).
    */
  private def probedCids(spark: SparkSession, centroids: String,
      queries: String, nprobe: Int): Option[Seq[Long]] = scala.util.Try {
    val maxQ = graft.operators.SimilarityOps.GatherMaxQueries
    // Regime gate FIRST, and JOBLESS where provable (r21): the
    // queries relation's parquet footers decide over/under-cap
    // without any Spark job ([[graft.operators.RelationRowBound]] —
    // exact counts, short-circuited past the cap). The r20 gate's
    // bounded `LIMIT cap+1` count job cost ~0.2 s of fixed driver
    // scheduling PER GRAFT_ANN STATEMENT (sim12's whole gap to its
    // API twin on over-cap batches, and a pure EXTRA job ahead of the
    // ranking aggregate on bounded ones — tx44's probe is a filtered
    // single row). Footer-unprovable shapes now run the ranking
    // aggregate DIRECTLY: its LIMIT already bounds the work at
    // cap ≈ maxQ ranked queries and its row count already signals
    // over-cap — probeRegime's one-job fold, finally on the SQL
    // surface too. Exactly probeRegime's bounded-batch boundary, so
    // SQL and API probes prune under the same contract.
    val nq: Long = graft.operators.RelationRowBound
      .boundedCount(spark.table(queries), maxQ).getOrElse(-1L)
    val cap = maxQ * math.max(nprobe, 1) + 1
    val row = if (nq > maxQ) null else spark.sql(
      s"""SELECT count(1) AS n, collect_set(cid) AS cids,
         |       (SELECT count(*) FROM $centroids) AS k
         |FROM (
         |  SELECT pcid AS cid
         |  FROM (SELECT ea, array_norm(ea) AS na,
         |               (SELECT collect_list(named_struct(
         |                  'cid', cid, 'ce', ce, 'cn', array_norm(ce)))
         |                FROM $centroids) AS cents
         |        FROM (SELECT transform(embedding,
         |                gx -> CAST(gx AS DOUBLE)) AS ea
         |              FROM $queries))
         |  LATERAL VIEW explode(transform(slice(array_sort(
         |    transform(cents, c -> named_struct(
         |      'ns', -round(array_dot(ea, c.ce) / (na * c.cn), 6),
         |      'cid', c.cid))), 1, $nprobe), s -> s.cid)) gp AS pcid
         |  LIMIT $cap)""".stripMargin).head()
    if (row == null || row.getLong(0) >= cap) None
    else {
      val cids = row.getSeq[Long](1).sorted
      // a set covering every list prunes nothing; empty means an
      // empty queries relation (result empty either way)
      if (cids.nonEmpty && cids.length < row.getLong(2)) Some(cids)
      else None
    }
  }.toOption.flatten

  /** The injected join-side filter: ` AND <alias>.cid IN (…)` when a
    * strict probed subset was resolved, else empty.
    */
  private def cidFilterSql(alias: String,
      cids: Option[Seq[Long]]): String =
    cids.fold("")(cs => s" AND $alias.cid IN (${cs.mkString(", ")})")

  def apply(spark: SparkSession, sql: String): String = {
    // cheap pre-screen: the macro name must appear at all
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("GRAFT_ANN"))
      return sql
    var cur = sql
    var guard = 0
    var changed = true
    while (changed) {
      require(guard < 64, "GRAFT_ANN rewrite did not converge")
      guard += 1
      rewriteFirst(spark, cur) match {
        case Some(next) => cur = next
        case None => changed = false
      }
    }
    cur
  }

  private def rewriteFirst(spark: SparkSession,
      s: String): Option[String] = {
    val isViewDef = ViewDef
      .findFirstIn(s.toUpperCase(java.util.Locale.ROOT)).isDefined
    val toks = AsOfSqlLexer.lex(s)
    var i = 0
    while (i + 1 < toks.length) {
      if (toks(i).word == "GRAFT_ANN" && toks(i + 1).word == "(") {
        val open = toks(i + 1)
        // the matching close paren: first ")" back at the open's depth
        val closeIdx = toks.indexWhere(t =>
          t.word == ")" && t.depth == open.depth, i + 2)
        if (closeIdx < 0)
          fail("unbalanced parentheses in GRAFT_ANN(...)")
        val close = toks(closeIdx)
        val rawArgs = s.substring(open.end, close.start)
        val (store, queries, k, nprobe, rerank) = rawArgs match {
          case ArgShape(st, q, kk, np, rr) =>
            (st.toLowerCase(java.util.Locale.ROOT),
              q.toLowerCase(java.util.Locale.ROOT), kk.toInt, np.toInt,
              Option(rr).map(_.toInt))
          case _ => fail("expected GRAFT_ANN('<index_store>', " +
            "'<queries_table>', <k>, <nprobe>[, <rerank>]), " +
            s"got args: $rawArgs")
        }
        if (k < 1) fail(s"k must be >= 1, got $k")
        if (nprobe < 1) fail(s"nprobe must be >= 1, got $nprobe")
        // time-travel composition: a retained index GENERATION
        // (`store__v<n>`, from versioned maintenance with retain > 0)
        // probes against its OWN snapshotted centroid companion
        // (`store__v<n>_centroids`, pinned at swap time). Never fall
        // back to the base companion for a generation name: a full
        // rebuild retrains the base quantizer while retained
        // generations survive, and old lists × new centroids is a
        // silent mis-probe. A generation without its snapshot is a
        // loud error, not a guess.
        val centroids = store + "_centroids"
        if (!spark.catalog.tableExists(store))
          fail(s"$store is not a stored IVF index — expected catalog " +
            s"tables $store (inverted lists) and $centroids " +
            "(write one with SimilarityOps.writeIvfIndex)")
        // PQ tier dispatch FIRST: a product-quantized store's rows
        // carry `codes` (m bytes/vector) and its quantizer companion
        // is `_codebooks`, not `_centroids`
        val isPq = spark.table(store).columns
          .map(_.toLowerCase(java.util.Locale.ROOT)).contains("codes")
        if (isPq) {
          val sb = new StringBuilder(s)
          sb.replace(toks(i).start, close.end,
            pqBody(spark, store, queries, k, nprobe, rerank,
              pruneOk = !isViewDef))
          return Some(sb.toString)
        }
        if (!spark.catalog.tableExists(centroids)) {
          if ("(.+)__v\\d+$".r.findFirstMatchIn(store).isDefined)
            fail(s"$store is a retained index generation with no " +
              s"snapshotted quantizer companion ($centroids): its " +
              "lists were assigned under a quantizer the base " +
              "companion may no longer hold (a full rebuild " +
              "retrains it), so probing would be silently wrong. " +
              "Re-run the store maintenance (any compaction/delta " +
              "swap snapshots companions) or probe the serving name.")
          else
            fail(s"$store is not a stored IVF index — expected " +
              s"catalog tables $store (inverted lists) and " +
              s"$centroids (write one with " +
              "SimilarityOps.writeIvfIndex)")
        }
        // quantizer lineage: when both the lists (a versioned serving
        // view resolves to its current generation) and the companion
        // carry a build stamp, they must match — a mismatch means a
        // rebuild retrained the quantizer out from under these lists,
        // or a stale snapshot was forced onto a generation; probing
        // would silently mis-assign probe lists, so fail loudly
        {
          val listsTable = scala.util.Try(graft.operators.BucketedStores
            .currentGeneration(spark, store)).getOrElse(store)
          val ls = graft.operators.BucketedStores
            .buildStamp(spark, listsTable)
          val cs = graft.operators.BucketedStores
            .buildStamp(spark, centroids)
          (ls, cs) match {
            case (Some(l), Some(c)) if l != c =>
              fail(s"quantizer build mismatch: $listsTable lists " +
                s"were assigned under build $l but $centroids " +
                s"carries build $c — the quantizer was rebuilt out " +
                "from under these lists; rebuild the index before " +
                "serving")
            case _ => ()
          }
        }
        // tier dispatch: an SQ8 store's lists carry (q, amax) instead
        // of e — it probes through the quantized expansion (int8 scan
        // kernel + exact-float rerank off the _vecs companion) and
        // REQUIRES <rerank>; a float store must not be given one
        val isSq8 = {
          val cols = spark.table(store).columns
            .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
          cols.contains("q") && cols.contains("amax")
        }
        val body = if (isSq8) {
          val rr = rerank.getOrElse(fail(s"$store is a quantized " +
            "(SQ8) index store — the <rerank> argument is required: " +
            s"GRAFT_ANN('$store', '<queries>', k, nprobe, rerank)"))
          if (rr < k) fail(s"rerank ($rr) must be >= k ($k) — the " +
            "exact re-rank can only return candidates the quantized " +
            "pass kept")
          val vecs = store + "_vecs"
          if (!spark.catalog.tableExists(vecs)) {
            if ("(.+)__v\\d+$".r.findFirstMatchIn(store).isDefined)
              fail(s"$store is a retained SQ8 index generation with " +
                s"no snapshotted float companion ($vecs): the exact " +
                "re-rank needs the floats the generation's lists " +
                "were built from, and the base companion may have " +
                "been rebuilt since. Re-run the store maintenance " +
                "(any swap snapshots both companions) or probe the " +
                "serving name.")
            else
              fail(s"$store has no float companion $vecs for the " +
                "exact re-rank (write the index with " +
                "SimilarityOps.writeIvfSq8Index)")
          }
          // same lineage discipline as the centroids: a stamped
          // lists/_vecs pair must carry ONE build id
          {
            val listsTable = scala.util.Try(graft.operators
              .BucketedStores.currentGeneration(spark, store))
              .getOrElse(store)
            val ls = graft.operators.BucketedStores
              .buildStamp(spark, listsTable)
            val vs = graft.operators.BucketedStores
              .buildStamp(spark, vecs)
            (ls, vs) match {
              case (Some(l), Some(v)) if l != v =>
                fail(s"quantizer build mismatch: $listsTable lists " +
                  s"carry build $l but $vecs carries build $v — " +
                  "the index was rebuilt out from under these " +
                  "lists; rebuild before serving")
              case _ => ()
            }
          }
          sq8Expansion(store, centroids, vecs, queries, k, nprobe, rr,
            if (isViewDef) None
            else probedCids(spark, centroids, queries, nprobe))
        } else {
          rerank.foreach(_ => fail(s"$store is a float IVF store — " +
            "<rerank> only applies to quantized (SQ8) stores"))
          expansion(store, centroids, queries, k, nprobe,
            if (isViewDef) None
            else probedCids(spark, centroids, queries, nprobe))
        }
        val sb = new StringBuilder(s)
        sb.replace(toks(i).start, close.end, body)
        return Some(sb.toString)
      }
      i += 1
    }
    None
  }

  /** The stock-grammar probe, shaped to probeIvfIndex's own plan:
    * probe selection happens IN-ROW (the k-row companion folds to an
    * array via an uncorrelated scalar subquery — the SQL spelling of
    * the API's broadcast centroid literal; no per-query window, no
    * cross-join shuffle), and top-1 is a max-struct aggregate (map-
    * side partials) rather than a window — the window form only for
    * k > 1, where WindowGroupLimit keeps it candidate-bounded. CTE
    * names are macro-prefixed and scoped to the derived table, so two
    * GRAFT_ANN calls in one statement can't collide.
    */
  private def expansion(store: String, centroids: String,
      queries: String, k: Int, nprobe: Int,
      cids: Option[Seq[Long]]): String = {
    val head =
      s"""(WITH graft_ann_cents AS (
         |  SELECT collect_list(named_struct(
         |           'cid', cid, 'ce', ce, 'cn', array_norm(ce))) AS cs
         |  FROM $centroids),
         |graft_ann_q AS (
         |  SELECT vec_id AS id_a,
         |         transform(embedding, gx -> CAST(gx AS DOUBLE)) AS ea
         |  FROM $queries),
         |graft_ann_probe AS (
         |  SELECT id_a, ea, na, pcid AS cid
         |  FROM (SELECT id_a, ea, array_norm(ea) AS na,
         |               (SELECT cs FROM graft_ann_cents) AS cents
         |        FROM graft_ann_q)
         |  LATERAL VIEW explode(transform(slice(array_sort(
         |    transform(cents, c -> named_struct(
         |      'ns', -round(array_dot(ea, c.ce) / (na * c.cn), 6),
         |      'cid', c.cid))), 1, $nprobe), s -> s.cid)) gp AS pcid),
         |graft_ann_cand AS (
         |  SELECT p.id_a, i.vid AS ann_id,
         |         round(array_dot(p.ea, i.e) / (p.na * i.nrm), 6) AS score
         |  FROM graft_ann_probe p JOIN $store i
         |    ON i.cid = p.cid AND i.vid <> p.id_a${cidFilterSql("i", cids)})
         |""".stripMargin
    val tail =
      if (k == 1)
        """SELECT id_a, -gbest.nid AS ann_id, gbest.score AS score,
          |       1 AS rank
          |FROM (SELECT id_a, max(named_struct(
          |        'score', score, 'nid', -ann_id)) AS gbest
          |      FROM graft_ann_cand GROUP BY id_a))""".stripMargin
      else
        // bounded topk_pairs aggregate, not a candidate-set window:
        // the float candidates are corpus-scale, and a row_number
        // window would shuffle + sort them all (see TopKPairs)
        s"""SELECT id_a, gp.id AS ann_id, gp.score AS score,
           |       gpos + 1 AS rank
           |FROM (SELECT id_a, topk_pairs(score, ann_id, $k) AS tk
           |      FROM graft_ann_cand GROUP BY id_a)
           |LATERAL VIEW posexplode(tk) gtk AS gpos, gp)""".stripMargin
    head + tail
  }

  /** PQ dispatch: contract checks + lineage stamps, then the ADC
    * expansion. A FLAT PQ store ([[graft.operators.SimilarityOps
    * .writePqIndex]] — no `cid` column) scans the whole code table,
    * so `nprobe` must be 1; an IVF-PQ store ([[graft.operators
    * .SimilarityOps.writeIvfPqIndex]] — cid-bucketed code lists plus
    * a `_centroids` companion) probes its `nprobe` nearest lists like
    * every IVF tier. `rerank` is required on both (the ADC pass only
    * prunes — the exact-cosine re-rank decides).
    */
  private def pqBody(spark: SparkSession, store: String,
      queries: String, k: Int, nprobe: Int,
      rerank: Option[Int], pruneOk: Boolean): String = {
    val codebooks = store + "_codebooks"
    val vecs = store + "_vecs"
    val isGen = "(.+)__v\\d+$".r.findFirstMatchIn(store).isDefined
    if (!spark.catalog.tableExists(codebooks)) {
      if (isGen)
        fail(s"$store is a retained PQ index generation with no " +
          s"snapshotted quantizer companion ($codebooks): its codes " +
          "were assigned under codebooks the base companion may no " +
          "longer hold, so probing would be silently wrong. Re-run " +
          "the store maintenance or probe the serving name.")
      else
        fail(s"$store is not a stored PQ index — expected catalog " +
          s"tables $store (code rows), $codebooks and $vecs (write " +
          "one with SimilarityOps.writePqIndex)")
    }
    if (!spark.catalog.tableExists(vecs)) {
      if (isGen)
        fail(s"$store is a retained PQ index generation with no " +
          s"snapshotted float companion ($vecs) for the exact " +
          "re-rank. Re-run the store maintenance or probe the " +
          "serving name.")
      else
        fail(s"$store has no float companion $vecs for the exact " +
          "re-rank (write the index with SimilarityOps.writePqIndex)")
    }
    val rr = rerank.getOrElse(fail(s"$store is a PRODUCT-QUANTIZED " +
      "index store — the <rerank> argument is required: " +
      s"GRAFT_ANN('$store', '<queries>', k, nprobe, rerank)"))
    if (rr < k) fail(s"rerank ($rr) must be >= k ($k) — the exact " +
      "re-rank can only return candidates the ADC pass kept")
    // IVF-PQ vs flat PQ: coarse lists show as a `cid` column
    val isIvf = spark.table(store).columns
      .map(_.toLowerCase(java.util.Locale.ROOT)).contains("cid")
    if (!isIvf && nprobe != 1)
      fail(s"$store is a FLAT product-quantized store — the ADC scan " +
        "has no coarse lists to probe, so <nprobe> must be 1, got " +
        s"$nprobe (build with SimilarityOps.writeIvfPqIndex for a " +
        "probed-list PQ store)")
    val centroids = store + "_centroids"
    if (isIvf && !spark.catalog.tableExists(centroids)) {
      if (isGen)
        fail(s"$store is a retained IVF-PQ index generation with no " +
          s"snapshotted coarse-quantizer companion ($centroids): its " +
          "lists were assigned under a quantizer the base companion " +
          "may no longer hold, so probing would be silently wrong. " +
          "Re-run the store maintenance or probe the serving name.")
      else
        fail(s"$store has coarse lists (cid) but no $centroids " +
          "companion (write the index with " +
          "SimilarityOps.writeIvfPqIndex)")
    }
    val listsTable = scala.util.Try(graft.operators.BucketedStores
      .currentGeneration(spark, store)).getOrElse(store)
    val ls = graft.operators.BucketedStores.buildStamp(spark, listsTable)
    (Seq(codebooks, vecs) ++ (if (isIvf) Seq(centroids) else Nil))
      .foreach { c =>
        (ls, graft.operators.BucketedStores.buildStamp(spark, c)) match {
          case (Some(l), Some(cc)) if l != cc =>
            fail(s"quantizer build mismatch: $listsTable code rows " +
              s"carry build $l but $c carries build $cc — the index " +
              "was rebuilt out from under these rows; rebuild before " +
              "serving")
          case _ => ()
        }
      }
    val writer =
      if (isIvf) "SimilarityOps.writeIvfPqIndex"
      else "SimilarityOps.writePqIndex"
    val sub = scala.util.Try {
      spark.sql(s"SHOW TBLPROPERTIES $codebooks").collect()
        .find(_.getString(0) == "graft.pq.sub").map(_.getString(1).toInt)
    }.toOption.flatten.getOrElse(fail(s"$codebooks carries no " +
      s"graft.pq.sub property — write the index with $writer"))
    if (isIvf)
      ivfPqExpansion(store, centroids, codebooks, vecs, queries, k,
        nprobe, sub, rr,
        if (pruneOk) probedCids(spark, centroids, queries, nprobe)
        else None)
    else pqExpansion(store, codebooks, vecs, queries, k, sub, rr)
  }

  /** The PQ expansion, shaped to probePqIndex's plan: codebooks fold
    * to ONE sorted nested array (code id == position); each query
    * computes its m×codes distance table IN-ROW; the flat code scan
    * joins the broadcast query side and pays m table lookups per
    * pair through the codegen'd `pq_adc` kernel (exact micro-unit
    * sum of the 6-dp entries — bit-equal to a DECIMAL(20,6) sum,
    * bit-deterministic under any partition order, unsigned code
    * decode built in); survivors come from the bounded `topk_pairs`
    * aggregate; the exact-cosine re-rank reads query floats from the
    * QUERY side and corpus floats from the `_vecs` companion.
    */
  private def pqExpansion(store: String, codebooks: String,
      vecs: String, queries: String, k: Int, sub: Int,
      rerank: Int): String = {
    val head =
      s"""(WITH graft_pq_cbk AS (
         |  SELECT sort_array(collect_list(named_struct(
         |           'j', j, 'cs', cs))) AS cbk
         |  FROM (SELECT j, sort_array(collect_list(named_struct(
         |                 'c', c, 'ce', ce))) AS cs
         |        FROM $codebooks GROUP BY j)),
         |graft_pq_q AS (
         |  SELECT vec_id AS id_a,
         |         transform(embedding, gx -> CAST(gx AS DOUBLE)) AS ea
         |  FROM $queries),
         |graft_pq_qt AS (
         |  SELECT id_a, ea, array_norm(ea) AS na,
         |         transform(cbk, gy -> transform(gy.cs, gx ->
         |           round(aggregate(zip_with(
         |             slice(ea, gy.j * $sub + 1, $sub), gx.ce,
         |             (ga, gb) -> (ga - gb) * (ga - gb)),
         |             CAST(0.0 AS DOUBLE),
         |             (gacc, gz) -> gacc + gz), 6))) AS qtab
         |  FROM (SELECT id_a, ea,
         |               (SELECT cbk FROM graft_pq_cbk) AS cbk
         |        FROM graft_pq_q)),
         |graft_pq_sc AS (
         |  SELECT q.id_a, p.vid AS ann_id,
         |         pq_adc(p.codes, q.qtab) AS adcd
         |  FROM $store p JOIN graft_pq_qt q ON p.vid <> q.id_a),
         |graft_pq_sv AS (
         |  SELECT id_a, gp.id AS ann_id FROM (
         |    SELECT id_a, topk_pairs(-adcd, ann_id, $rerank) AS tk
         |    FROM graft_pq_sc GROUP BY id_a)
         |  LATERAL VIEW explode(tk) gsv AS gp),
         |graft_pq_cand AS (
         |  SELECT sv.id_a, sv.ann_id,
         |         round(array_dot(qz.ea, vb.e) / (qz.na * vb.nrm), 6)
         |           AS score
         |  FROM graft_pq_sv sv
         |  JOIN graft_pq_qt qz ON qz.id_a = sv.id_a
         |  JOIN $vecs vb ON vb.vid = sv.ann_id)
         |""".stripMargin
    val tail =
      if (k == 1)
        """SELECT id_a, -gbest.nid AS ann_id, gbest.score AS score,
          |       1 AS rank
          |FROM (SELECT id_a, max(named_struct(
          |        'score', score, 'nid', -ann_id)) AS gbest
          |      FROM graft_pq_cand GROUP BY id_a))""".stripMargin
      else
        s"""SELECT id_a, gp.id AS ann_id, gp.score AS score,
           |       gpos + 1 AS rank
           |FROM (SELECT id_a, topk_pairs(score, ann_id, $k) AS tk
           |      FROM graft_pq_cand GROUP BY id_a)
           |LATERAL VIEW posexplode(tk) gtk AS gpos, gp)""".stripMargin
    head + tail
  }

  /** The IVF-PQ expansion, shaped to probeIvfPqIndex's plan: the
    * codebooks fold to one sorted nested array (code id == position,
    * decoded UNSIGNED — pmod 256 — because ids past 127 store as
    * negative bytes); the k-row coarse companion folds to the probe
    * array; each query computes its m×codes distance table AND ranks
    * its `nprobe` lists in-row; the ADC scan joins ONLY the probed
    * cid lists (bucket-aligned, m bytes per candidate); survivors
    * come from the bounded `topk_pairs` aggregate and re-rank by
    * exact cosine off the `_vecs` companion.
    */
  private def ivfPqExpansion(store: String, centroids: String,
      codebooks: String, vecs: String, queries: String, k: Int,
      nprobe: Int, sub: Int, rerank: Int,
      cids: Option[Seq[Long]]): String = {
    val head =
      s"""(WITH graft_pq_cbk AS (
         |  SELECT sort_array(collect_list(named_struct(
         |           'j', j, 'cs', cs))) AS cbk
         |  FROM (SELECT j, sort_array(collect_list(named_struct(
         |                 'c', c, 'ce', ce))) AS cs
         |        FROM $codebooks GROUP BY j)),
         |graft_ann_cents AS (
         |  SELECT collect_list(named_struct(
         |           'cid', cid, 'ce', ce, 'cn', array_norm(ce))) AS cs
         |  FROM $centroids),
         |graft_pq_q AS (
         |  SELECT vec_id AS id_a,
         |         transform(embedding, gx -> CAST(gx AS DOUBLE)) AS ea
         |  FROM $queries),
         |graft_pq_qt AS (
         |  SELECT id_a, ea, array_norm(ea) AS na,
         |         transform(cbk, gy -> transform(gy.cs, gx ->
         |           round(aggregate(zip_with(
         |             slice(ea, gy.j * $sub + 1, $sub), gx.ce,
         |             (ga, gb) -> (ga - gb) * (ga - gb)),
         |             CAST(0.0 AS DOUBLE),
         |             (gacc, gz) -> gacc + gz), 6))) AS qtab
         |  FROM (SELECT id_a, ea,
         |               (SELECT cbk FROM graft_pq_cbk) AS cbk
         |        FROM graft_pq_q)),
         |graft_pq_probe AS (
         |  SELECT id_a, qtab, pcid AS cid
         |  FROM (SELECT id_a, ea, na, qtab,
         |               (SELECT cs FROM graft_ann_cents) AS cents
         |        FROM graft_pq_qt)
         |  LATERAL VIEW explode(transform(slice(array_sort(
         |    transform(cents, c -> named_struct(
         |      'ns', -round(array_dot(ea, c.ce) / (na * c.cn), 6),
         |      'cid', c.cid))), 1, $nprobe), s -> s.cid)) gp AS pcid),
         |graft_pq_sc AS (
         |  SELECT q.id_a, p.vid AS ann_id,
         |         pq_adc(p.codes, q.qtab) AS adcd
         |  FROM $store p JOIN graft_pq_probe q
         |    ON p.cid = q.cid AND p.vid <> q.id_a${cidFilterSql("p", cids)}),
         |graft_pq_sv AS (
         |  SELECT id_a, gp.id AS ann_id FROM (
         |    SELECT id_a, topk_pairs(-adcd, ann_id, $rerank) AS tk
         |    FROM graft_pq_sc GROUP BY id_a)
         |  LATERAL VIEW explode(tk) gsv AS gp),
         |graft_pq_cand AS (
         |  SELECT sv.id_a, sv.ann_id,
         |         round(array_dot(qz.ea, vb.e) / (qz.na * vb.nrm), 6)
         |           AS score
         |  FROM graft_pq_sv sv
         |  JOIN graft_pq_qt qz ON qz.id_a = sv.id_a
         |  JOIN $vecs vb ON vb.vid = sv.ann_id)
         |""".stripMargin
    val tail =
      if (k == 1)
        """SELECT id_a, -gbest.nid AS ann_id, gbest.score AS score,
          |       1 AS rank
          |FROM (SELECT id_a, max(named_struct(
          |        'score', score, 'nid', -ann_id)) AS gbest
          |      FROM graft_pq_cand GROUP BY id_a))""".stripMargin
      else
        s"""SELECT id_a, gp.id AS ann_id, gp.score AS score,
           |       gpos + 1 AS rank
           |FROM (SELECT id_a, topk_pairs(score, ann_id, $k) AS tk
           |      FROM graft_pq_cand GROUP BY id_a)
           |LATERAL VIEW posexplode(tk) gtk AS gpos, gp)""".stripMargin
    head + tail
  }

  /** The quantized-store expansion, shaped to probeIvfSq8Index's plan:
    * queries quantize IN-ROW (`int8_quantize` kernel, amax folded as a
    * scalar so it evaluates once per row), probe lists come off the
    * cid-bucket-aligned scan carrying 1-byte/dim vectors, candidates
    * score with the exact `array_dot_q8` integer kernel, the quantized
    * top-`rerank` per query survive (WindowGroupLimit bounds it), and
    * only those few join the `_vecs` float companion for the exact-
    * cosine re-rank — the faiss refine shape as stock SQL text. Same
    * tie-breaks as the API probe: (qscore DESC, ann_id) at the
    * quantized cut, (score DESC, ann_id) at the final rank.
    */
  private def sq8Expansion(store: String, centroids: String,
      vecs: String, queries: String, k: Int, nprobe: Int,
      rerank: Int, cids: Option[Seq[Long]]): String = {
    val head =
      s"""(WITH graft_ann_cents AS (
         |  SELECT collect_list(named_struct(
         |           'cid', cid, 'ce', ce, 'cn', array_norm(ce))) AS cs
         |  FROM $centroids),
         |graft_ann_q AS (
         |  SELECT vec_id AS id_a,
         |         transform(embedding, gx -> CAST(gx AS DOUBLE)) AS ea
         |  FROM $queries),
         |graft_ann_qz AS (
         |  SELECT id_a, ea, array_norm(ea) AS na, amax_a,
         |         int8_quantize(ea, amax_a) AS qa
         |  FROM (SELECT id_a, ea,
         |               aggregate(ea, CAST(0.0 AS DOUBLE),
         |                 (ga, gx) -> greatest(ga, abs(gx))) AS amax_a
         |        FROM graft_ann_q)),
         |graft_ann_probe AS (
         |  SELECT id_a, qa, amax_a, na, pcid AS cid
         |  FROM (SELECT id_a, qa, amax_a, na, ea,
         |               (SELECT cs FROM graft_ann_cents) AS cents
         |        FROM graft_ann_qz)
         |  LATERAL VIEW explode(transform(slice(array_sort(
         |    transform(cents, c -> named_struct(
         |      'ns', -round(array_dot(ea, c.ce) / (na * c.cn), 6),
         |      'cid', c.cid))), 1, $nprobe), s -> s.cid)) gp AS pcid),
         |graft_ann_qs AS (
         |  SELECT p.id_a, i.vid AS ann_id,
         |         round(CAST(array_dot_q8(p.qa, i.q) AS DOUBLE)
         |               / ((127.0D / p.amax_a) * (127.0D / i.amax))
         |               / (p.na * i.nrm), 6) AS qscore
         |  FROM graft_ann_probe p JOIN $store i
         |    ON i.cid = p.cid AND i.vid <> p.id_a${cidFilterSql("i", cids)}),
         |graft_ann_sv AS (
         |  SELECT id_a, gp.id AS ann_id FROM (
         |    SELECT id_a, topk_pairs(qscore, ann_id, $rerank) AS tk
         |    FROM graft_ann_qs GROUP BY id_a)
         |  LATERAL VIEW explode(tk) gsv AS gp),
         |graft_ann_cand AS (
         |  SELECT sv.id_a, sv.ann_id,
         |         round(array_dot(qz.ea, vb.e) / (qz.na * vb.nrm), 6)
         |           AS score
         |  FROM graft_ann_sv sv
         |  JOIN graft_ann_qz qz ON qz.id_a = sv.id_a
         |  JOIN $vecs vb ON vb.vid = sv.ann_id)
         |""".stripMargin
    val tail =
      if (k == 1)
        """SELECT id_a, -gbest.nid AS ann_id, gbest.score AS score,
          |       1 AS rank
          |FROM (SELECT id_a, max(named_struct(
          |        'score', score, 'nid', -ann_id)) AS gbest
          |      FROM graft_ann_cand GROUP BY id_a))""".stripMargin
      else
        s"""SELECT id_a, ann_id, score, rank FROM (
           |  SELECT id_a, ann_id, score,
           |         ROW_NUMBER() OVER (PARTITION BY id_a
           |           ORDER BY score DESC, ann_id) AS rank
           |  FROM graft_ann_cand)
           |WHERE rank <= $k)""".stripMargin
    head + tail
  }
}

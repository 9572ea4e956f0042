package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.GraftPipeline

/** CLI for [[graft.operators.GraftPipeline]] — the composed
  * training-data pipeline as a runnable tool, option style mirroring
  * [[graft.wod.Cli]] (explicit knobs, loud usage errors, `execute`
  * split from `main` so specs drive the full path on a shared
  * session):
  *
  *   --input/-i <parquet>     corpus (must carry --id-col / --text-col)
  *   --output/-o <dir>        packed output parquet
  *   --id-col NAME            default doc_id
  *   --text-col NAME          default text
  *   --min-chars N            quality gate (default 100; 0 disables)
  *   --dedup exact|near|none  default exact
  *   --near-min-jaccard D     near-dedup threshold (default 0.2)
  *   --num-hashes N --bands N minhash shape (defaults 8 / 2)
  *   --eval <parquet>         decontaminate against this set
  *   --shards N --seq-len N   packing shape (defaults 4 / 512)
  *   --seed S                 shard seed (default ts42)
  *   --provenance <dir>       also write the per-input-doc audit trail
  *                            (disposition / canonical id / shard+pos —
  *                            [[GraftPipeline.runWithProvenance]];
  *                            batch exact-dedup mode only)
  *
  * Incremental mode (the pl3 path — nightly changelogs against a
  * standing [[GraftPipeline.buildExactIndex]] store; forces exact
  * dedup, `--dedup`/`--eval` are batch-only):
  *
  *   --build-index NAME       stand up the (id, hash) index from the
  *                            quality-gated corpus, then exit
  *   --index NAME             keep list from this stored index
  *   --build-near-index LSH,PAIRS  stand up the pl4 pair: LSH band
  *                            index + verified-pair store, then exit
  *   --near-index LSH,PAIRS   near keep list from the stored pair set
  *   --deletes <parquet>      changelog deletes (id column = --id-col)
  *   --upserts <parquet>      changelog upserts (id + text columns)
  *   --mor                    merge-on-read maintenance: changelogs
  *                            append tombstones + delta rows instead
  *                            of rewriting the generation (build the
  *                            store with --mor too; compact on your
  *                            schedule via BucketedStores.morCompact)
  *   --retain N               snapshot retention for copy-on-write
  *                            exact-index changelogs: keep the last N
  *                            generations readable AS OF their version
  *                            (GraftPipeline.keepListFromSnapshot —
  *                            past builds stay reproducible); default 0
  *   --as-of K                rebuild a PAST training set: derive the
  *                            keep list from the --index store's
  *                            RETAINED generation K instead of the
  *                            live view (pair with --retain on the
  *                            maintenance runs that preceded it)
  *
  * Store housekeeping (runs alone, then exits):
  *
  *   --vacuum <root>          delete retired generation dirs under
  *                            root (catalog-reachability GC —
  *                            BucketedStores.vacuumOrphans)
  *   --vacuum-retention-h N   age guard in hours (default 24; 0 only
  *                            when no writer/reader can be in flight)
  *   --compact NAME           fold a MoR exact index's tombstones in
  *                            (GraftPipeline.morCompactExactIndex);
  *                            NAME,LSH_PAIRS form (`--compact L,P`)
  *                            compacts a near-store pair instead
  *
  * Output discipline: one `mode=overwrite` parquet write of the packed
  * set — the write inherits the pack stage's single hash exchange, so
  * output file count is bounded by the shard partitioning, not by
  * input splits.
  */
object PipelineCli {

  final case class Args(
      input: String = null,
      output: String = null,
      idCol: String = "doc_id",
      textCol: String = "text",
      dedup: String = "exact",
      eval: Option[String] = None,
      buildIndex: Option[String] = None,
      index: Option[String] = None,
      buildNearIndex: Option[(String, String)] = None,
      nearIndex: Option[(String, String)] = None,
      deletes: Option[String] = None,
      upserts: Option[String] = None,
      provenance: Option[String] = None,
      retain: Int = 0,
      asOf: Option[Int] = None,
      mor: Boolean = false,
      vacuum: Option[String] = None,
      vacuumRetentionH: Int = 24,
      compact: Option[String] = None,
      cfg: GraftPipeline.Config = GraftPipeline.Config())

  private val usage =
    "usage: PipelineCli --input <parquet> --output <dir> " +
      "[--id-col N] [--text-col N] [--min-chars N] " +
      "[--dedup exact|near|none] [--near-min-jaccard D] " +
      "[--num-hashes N] [--bands N] [--eval <parquet>] " +
      "[--shards N] [--seq-len N] [--seed S] " +
      "[--build-index NAME | --index NAME | --build-near-index L,P | " +
      "--near-index L,P] [--deletes <parquet>] [--upserts <parquet>] " +
      "[--mor] | --vacuum <root> [--vacuum-retention-h N]"

  def parse(args: Array[String]): Args = {
    var a = Args()
    var i = 0
    def value(): String = {
      require(i + 1 < args.length, s"${args(i)} needs a value\n$usage")
      args(i + 1)
    }
    def intValue(): Int =
      try value().toInt
      catch { case _: NumberFormatException =>
        sys.error(s"${args(i)} needs an integer, got '${value()}'\n$usage") }
    def doubleValue(): Double =
      try value().toDouble
      catch { case _: NumberFormatException =>
        sys.error(s"${args(i)} needs a number, got '${value()}'\n$usage") }
    while (i < args.length) {
      args(i) match {
        case "--input" | "-i"  => a = a.copy(input = value()); i += 2
        case "--output" | "-o" => a = a.copy(output = value()); i += 2
        case "--id-col"        => a = a.copy(idCol = value()); i += 2
        case "--text-col"      => a = a.copy(textCol = value()); i += 2
        case "--min-chars"     =>
          a = a.copy(cfg = a.cfg.copy(minChars = intValue().toLong)); i += 2
        case "--dedup" =>
          val v = value()
          require(Set("exact", "near", "none")(v),
            s"--dedup must be exact|near|none, got '$v'\n$usage")
          a = a.copy(dedup = v); i += 2
        case "--near-min-jaccard" =>
          a = a.copy(cfg = a.cfg.copy(nearDedupMinJaccard = doubleValue()))
          i += 2
        case "--num-hashes" =>
          a = a.copy(cfg = a.cfg.copy(numHashes = intValue())); i += 2
        case "--bands" =>
          a = a.copy(cfg = a.cfg.copy(bands = intValue())); i += 2
        case "--eval"        => a = a.copy(eval = Some(value())); i += 2
        case "--shards" =>
          a = a.copy(cfg = a.cfg.copy(shards = intValue().toLong)); i += 2
        case "--seq-len" =>
          a = a.copy(cfg = a.cfg.copy(seqLen = intValue().toLong)); i += 2
        case "--seed" =>
          a = a.copy(cfg = a.cfg.copy(shardSeed = value())); i += 2
        case "--build-index" => a = a.copy(buildIndex = Some(value())); i += 2
        case "--index"       => a = a.copy(index = Some(value())); i += 2
        case "--build-near-index" | "--near-index" =>
          val pair = value().split(",") match {
            case Array(l, p) if l.nonEmpty && p.nonEmpty => (l, p)
            case _ => sys.error(
              s"${args(i)} needs LSHNAME,PAIRNAME\n$usage")
          }
          a = if (args(i) == "--build-near-index")
            a.copy(buildNearIndex = Some(pair))
          else a.copy(nearIndex = Some(pair))
          i += 2
        case "--deletes"     => a = a.copy(deletes = Some(value())); i += 2
        case "--upserts"     => a = a.copy(upserts = Some(value())); i += 2
        case "--provenance"  => a = a.copy(provenance = Some(value())); i += 2
        case "--retain"      => a = a.copy(retain = intValue()); i += 2
        case "--as-of"       => a = a.copy(asOf = Some(intValue())); i += 2
        case "--mor"         => a = a.copy(mor = true); i += 1
        case "--vacuum"      => a = a.copy(vacuum = Some(value())); i += 2
        case "--vacuum-retention-h" =>
          a = a.copy(vacuumRetentionH = intValue()); i += 2
        case "--compact"     => a = a.copy(compact = Some(value())); i += 2
        case other => sys.error(s"unknown option: $other\n$usage")
      }
    }
    if (a.vacuum.nonEmpty || a.compact.nonEmpty) {
      require(a.vacuum.isEmpty || a.compact.isEmpty,
        s"--vacuum and --compact are separate modes\n$usage")
      require(a.input == null && a.output == null &&
        Seq(a.buildIndex, a.index, a.buildNearIndex, a.nearIndex)
          .forall(_.isEmpty),
        s"housekeeping modes run alone\n$usage")
      return a
    }
    require(a.input != null, usage)
    require(a.output != null || a.buildIndex.nonEmpty ||
      a.buildNearIndex.nonEmpty, usage)
    require(Seq(a.buildIndex, a.index, a.buildNearIndex, a.nearIndex)
        .count(_.nonEmpty) <= 1,
      s"index modes are mutually exclusive\n$usage")
    require(a.index.nonEmpty || a.nearIndex.nonEmpty ||
      (a.deletes.isEmpty && a.upserts.isEmpty),
      s"--deletes/--upserts need --index or --near-index\n$usage")
    require(a.provenance.isEmpty ||
      (a.dedup == "exact" && a.index.isEmpty && a.nearIndex.isEmpty &&
        a.buildIndex.isEmpty && a.buildNearIndex.isEmpty),
      s"--provenance is batch exact-dedup mode only\n$usage")
    require(a.retain >= 0, s"--retain must be >= 0\n$usage")
    require(a.retain == 0 || (a.index.nonEmpty && !a.mor),
      s"--retain applies to copy-on-write --index changelogs only\n$usage")
    require(a.asOf.isEmpty || (a.index.nonEmpty && !a.mor &&
      a.deletes.isEmpty && a.upserts.isEmpty),
      s"--as-of reads a retained --index snapshot (no changelog)\n$usage")
    a = a.copy(cfg = a.cfg.copy(
      exactDedup = a.dedup == "exact", nearDedup = a.dedup == "near"))
    a
  }

  /** Run the mode the options describe; returns the summary `main`
    * prints.
    */
  def execute(spark: SparkSession, a: Args): String = (a.vacuum, a.compact) match {
    case (Some(root), _) =>
      val gone = graft.operators.BucketedStores.vacuumOrphans(spark,
        root, olderThanMs = a.vacuumRetentionH * 3600L * 1000)
      s"[pipeline] vacuumed ${gone.size} retired dirs under $root" +
        (if (gone.isEmpty) "" else gone.mkString(":\n  ", "\n  ", ""))
    case (_, Some(spec)) =>
      spec.split(",") match {
        case Array(name) =>
          GraftPipeline.morCompactExactIndex(spark, name, a.idCol)
          s"[pipeline] compacted exact index '$name'"
        case Array(lsh, pairs) if lsh.nonEmpty && pairs.nonEmpty =>
          GraftPipeline.morCompactNearIndexes(spark, lsh, pairs)
          s"[pipeline] compacted near indexes '$lsh'/'$pairs'"
        case _ => sys.error(s"--compact needs NAME or LSH,PAIRS\n$usage")
      }
    case _ => executeRun(spark, a)
  }

  private def executeRun(spark: SparkSession, a: Args): String = {
    val corpus = spark.read.parquet(a.input)
    def emptyIds: DataFrame = spark.emptyDataFrame
      .withColumn(a.idCol, org.apache.spark.sql.functions.lit(0L))
      .limit(0)
    def deletesDf = a.deletes.fold(emptyIds)(p => spark.read.parquet(p))
    def upsertsDf = a.upserts.map(p =>
      GraftPipeline.qualityFilter(spark.read.parquet(p), a.cfg))
    (a.buildIndex, a.buildNearIndex) match {
      case (Some(name), _) =>
        val gated = GraftPipeline.qualityFilter(corpus, a.cfg)
        if (a.mor)
          GraftPipeline.buildExactIndexMor(gated, a.idCol, a.textCol,
            name)
        else
          GraftPipeline.buildExactIndex(gated, a.idCol, a.textCol, name)
        val n = spark.table(name).count()
        s"[pipeline] index '$name' built: $n entries"
      case (_, Some((lsh, pairs))) =>
        val gated = GraftPipeline.qualityFilter(corpus, a.cfg)
        if (a.mor)
          GraftPipeline.buildNearIndexesMor(gated, a.idCol, a.textCol,
            lsh, pairs, a.cfg)
        else
          GraftPipeline.buildNearIndexes(gated, a.idCol, a.textCol,
            lsh, pairs, a.cfg)
        val n = spark.table(pairs).count()
        s"[pipeline] near indexes '$lsh'/'$pairs' built: $n pairs"
      case _ =>
        val packed: DataFrame = (a.index, a.nearIndex) match {
          case (Some(name), _) =>
            if (a.deletes.nonEmpty || a.upserts.nonEmpty) {
              if (a.mor)
                GraftPipeline.applyExactIndexDeltaMor(spark, name,
                  deletesDf, upsertsDf, a.idCol, a.textCol)
              else
                GraftPipeline.applyExactIndexDelta(spark, name,
                  deletesDf, upsertsDf, a.idCol, a.textCol,
                  retain = a.retain)
            }
            a.asOf match {
              case Some(k) =>
                GraftPipeline.pack(
                  GraftPipeline.qualityFilter(corpus, a.cfg)
                    .join(GraftPipeline.keepListFromSnapshot(spark,
                      name, k, a.idCol), Seq(a.idCol), "left_semi"),
                  a.idCol, a.textCol, a.cfg)
              case None =>
                GraftPipeline.runIncremental(spark, name, corpus,
                  a.idCol, a.textCol, a.cfg)
            }
          case (_, Some((lsh, pairs))) =>
            if (a.deletes.nonEmpty || a.upserts.nonEmpty) {
              if (a.mor)
                GraftPipeline.applyNearIndexDeltaMor(spark, lsh, pairs,
                  deletesDf, upsertsDf, a.idCol, a.textCol, a.cfg)
              else
                GraftPipeline.applyNearIndexDelta(spark, lsh, pairs,
                  deletesDf, upsertsDf, a.idCol, a.textCol, a.cfg)
            }
            GraftPipeline.runIncrementalNear(spark, pairs, corpus,
              a.idCol, a.textCol, a.cfg)
          case _ =>
            GraftPipeline.run(corpus, a.idCol, a.textCol, a.cfg,
              evalDocs = a.eval.map(p => spark.read.parquet(p)))
        }
        packed.write.mode("overwrite").parquet(a.output)
        val n = spark.read.parquet(a.output).count()
        val prov = a.provenance.fold("") { dir =>
          GraftPipeline.runWithProvenance(corpus, a.idCol, a.textCol,
              a.cfg, evalDocs = a.eval.map(p => spark.read.parquet(p)))
            .write.mode("overwrite").parquet(dir)
          val np = spark.read.parquet(dir).count()
          s"; provenance for $np docs -> $dir"
        }
        s"[pipeline] packed $n docs -> ${a.output}$prov"
    }
  }

  def main(args: Array[String]): Unit = {
    val a = parse(args)
    val spark = GraftSession.getOrCreate()
    try println(execute(spark, a))
    finally spark.stop()
  }
}

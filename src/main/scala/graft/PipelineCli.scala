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
  *
  * Incremental mode (the pl3 path — nightly changelogs against a
  * standing [[GraftPipeline.buildExactIndex]] store; forces exact
  * dedup, `--dedup`/`--eval` are batch-only):
  *
  *   --build-index NAME       stand up the (id, hash) index from the
  *                            quality-gated corpus, then exit
  *   --index NAME             keep list from this stored index
  *   --deletes <parquet>      changelog deletes (id column = --id-col)
  *   --upserts <parquet>      changelog upserts (id + text columns)
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
      deletes: Option[String] = None,
      upserts: Option[String] = None,
      cfg: GraftPipeline.Config = GraftPipeline.Config())

  private val usage =
    "usage: PipelineCli --input <parquet> --output <dir> " +
      "[--id-col N] [--text-col N] [--min-chars N] " +
      "[--dedup exact|near|none] [--near-min-jaccard D] " +
      "[--num-hashes N] [--bands N] [--eval <parquet>] " +
      "[--shards N] [--seq-len N] [--seed S] " +
      "[--build-index NAME | --index NAME [--deletes <parquet>] " +
      "[--upserts <parquet>]]"

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
        case "--deletes"     => a = a.copy(deletes = Some(value())); i += 2
        case "--upserts"     => a = a.copy(upserts = Some(value())); i += 2
        case other => sys.error(s"unknown option: $other\n$usage")
      }
    }
    require(a.input != null, usage)
    require(a.output != null || a.buildIndex.nonEmpty, usage)
    require(a.buildIndex.isEmpty || a.index.isEmpty,
      s"--build-index and --index are exclusive\n$usage")
    require(a.index.nonEmpty || (a.deletes.isEmpty && a.upserts.isEmpty),
      s"--deletes/--upserts need --index\n$usage")
    a = a.copy(cfg = a.cfg.copy(
      exactDedup = a.dedup == "exact", nearDedup = a.dedup == "near"))
    a
  }

  /** Run the mode the options describe; returns the summary `main`
    * prints.
    */
  def execute(spark: SparkSession, a: Args): String = {
    val corpus = spark.read.parquet(a.input)
    a.buildIndex match {
      case Some(name) =>
        GraftPipeline.buildExactIndex(
          GraftPipeline.qualityFilter(corpus, a.cfg), a.idCol, a.textCol,
          name)
        val n = spark.table(name).count()
        s"[pipeline] index '$name' built: $n entries"
      case None =>
        val packed: DataFrame = a.index match {
          case Some(name) =>
            if (a.deletes.nonEmpty || a.upserts.nonEmpty)
              GraftPipeline.applyExactIndexDelta(spark, name,
                a.deletes.fold(spark.emptyDataFrame
                    .withColumn(a.idCol, org.apache.spark.sql.functions
                      .lit(0L)).limit(0))(p => spark.read.parquet(p)),
                a.upserts.map(p => GraftPipeline.qualityFilter(
                  spark.read.parquet(p), a.cfg)),
                a.idCol, a.textCol)
            GraftPipeline.runIncremental(spark, name, corpus, a.idCol,
              a.textCol, a.cfg)
          case None =>
            GraftPipeline.run(corpus, a.idCol, a.textCol, a.cfg,
              evalDocs = a.eval.map(p => spark.read.parquet(p)))
        }
        packed.write.mode("overwrite").parquet(a.output)
        val n = spark.read.parquet(a.output).count()
        s"[pipeline] packed $n docs -> ${a.output}"
    }
  }

  def main(args: Array[String]): Unit = {
    val a = parse(args)
    val spark = GraftSession.getOrCreate()
    try println(execute(spark, a))
    finally spark.stop()
  }
}

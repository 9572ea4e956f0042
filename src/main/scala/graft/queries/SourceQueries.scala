package graft.queries

import org.apache.spark.sql.functions._
import Q._
import Tables._

/** Ingest-format queries: the non-parquet sources a training-data
  * pipeline actually receives (JSONL above all, CSV exports, parquet
  * deltas with evolved schemas), each exercised as a full write →
  * re-read → field-equality round-trip against the parquet truth.
  *
  * The round-trip IS the check: the oracle only states the expected
  * per-group counts, so any mangling in the format writer/reader
  * (quoting, escaping, unicode, null vs empty, schema drift) shows up
  * as a dropped `n_roundtrip_equal` and a hash mismatch — the engine
  * can't pass by reading back whatever it wrote wrong.
  */
object SourceQueries {

  /** JSONL round-trip (src1): the corpus interchange format. Written
    * one JSON object per line (splittable on read — a 100 TB JSONL
    * drop parallelizes per line-chunk), read back with the EXPLICIT
    * schema (never inferred — schema-on-read inference re-scans the
    * data and silently widens types), every field compared to the
    * parquet truth.
    */
  val src1JsonlRoundtrip = Q(
    "src1_jsonl_roundtrip",
    (s, d) => {
      val docs = documents(s, d)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_src1_jsonl").toString
      docs.write.mode("overwrite").json(tmp)
      val back = s.read.schema(docs.schema).json(tmp)
      docs.as("a").join(back.as("b"), Seq("doc_id"))
        .select(col("a.source").as("source"),
          (col("a.text") === col("b.text") &&
            col("a.lang") === col("b.lang") &&
            col("a.source") === col("b.source") &&
            col("a.n_chars") === col("b.n_chars")).cast("long").as("eq"))
        .groupBy(col("source"))
        .agg(cnt.as("n_docs"), sum(col("eq")).as("n_roundtrip_equal"))
        .orderBy(col("source"))
    },
    sql = Some("""
      SELECT source, COUNT(*) AS n_docs, COUNT(*) AS n_roundtrip_equal
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  /** CSV round-trip (src2): the export format everything eventually
    * arrives in. Written with quote-escaping (`"` doubled via
    * escape=quote), read back multiLine with the explicit schema —
    * multiLine because quoted text may embed record separators, and
    * that honesty costs splittability: a multiLine CSV file is ONE
    * input split, so at 100 TB the ingest contract is many files
    * (the staging layout every dump provides), not one big one.
    */
  val src2CsvRoundtrip = Q(
    "src2_csv_roundtrip",
    (s, d) => {
      val docs = documents(s, d)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_src2_csv").toString
      docs.write.mode("overwrite")
        .option("header", "true").option("quote", "\"")
        .option("escape", "\"")
        .csv(tmp)
      val back = s.read.schema(docs.schema)
        .option("header", "true").option("quote", "\"")
        .option("escape", "\"").option("multiLine", "true")
        .csv(tmp)
      docs.as("a").join(back.as("b"), Seq("doc_id"))
        .select(col("a.source").as("source"),
          (col("a.text") === col("b.text") &&
            col("a.lang") === col("b.lang") &&
            col("a.source") === col("b.source") &&
            col("a.n_chars") === col("b.n_chars")).cast("long").as("eq"))
        .groupBy(col("source"))
        .agg(cnt.as("n_docs"), sum(col("eq")).as("n_roundtrip_equal"))
        .orderBy(col("source"))
    },
    sql = Some("""
      SELECT source, COUNT(*) AS n_docs, COUNT(*) AS n_roundtrip_equal
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  /** Schema evolution (src3): a store written in two generations —
    * gen1 without the `lang` column, gen2 with it — read back as ONE
    * dataset via parquet schema merging, proving the engine absorbs
    * additive schema drift without rewriting history: gen1 rows
    * surface `lang` as NULL, gen2 rows carry it, and nothing else
    * changes. (mergeSchema is a read option, not a default, because
    * footer-merging every file of a 100 TB store on every read is a
    * planning cost you opt into on evolved stores only.)
    */
  val src3SchemaEvolution = Q(
    "src3_schema_evolution",
    (s, d) => {
      val docs = documents(s, d)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_src3_evo").toString
      val half = 250L // fixed id split: gen1 = low half of the id range
      docs.filter(col("doc_id") % 500 < half)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$tmp/gen=1")
      docs.filter(col("doc_id") % 500 >= half)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .write.mode("overwrite").parquet(s"$tmp/gen=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(col("source"))
        .agg(cnt.as("n_docs"),
          sum(when(col("lang").isNull, 1L).otherwise(0L))
            .as("n_pre_evolution"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))
    },
    sql = Some("""
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN doc_id % 500 < 250 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pre_evolution,
             COUNT(DISTINCT CASE WHEN doc_id % 500 >= 250 THEN lang END)
               AS n_langs
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  /** JSONL with a CORRUPT-RECORD channel (src4): real crawl drops
    * carry broken lines, and the reference's discipline (S7: per-cast
    * error isolation, never fail the file) applies: PERMISSIVE read
    * with `_corrupt_record` routes each broken line to the side
    * channel as raw text while every well-formed line parses — one
    * scan, no pre-validation pass. Corruption here is deterministic
    * (every doc_id ≡ 0 mod 50 loses its last 5 bytes, guaranteed to
    * sever the closing brace), so the oracle states exactly which
    * rows must land in which channel: corrupt rows surface as the
    * NULL-source group.
    */
  val src4JsonlCorruptChannel = Q(
    "src4_jsonl_corrupt_channel",
    (s, d) => {
      val docs = documents(s, d)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_src4_jsonl").toString
      docs.select(col("doc_id"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars"))).as("line"))
        .select(when(col("doc_id") % 50 === 0,
            expr("substring(line, 1, length(line) - 5)"))
          .otherwise(col("line")).as("value"))
        .write.mode("overwrite").text(tmp)
      val readSchema = org.apache.spark.sql.types.StructType(
        docs.schema.fields :+ org.apache.spark.sql.types.StructField(
          "_corrupt_record", org.apache.spark.sql.types.StringType))
      s.read.schema(readSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
        .groupBy(col("source"))
        .agg(cnt.as("n_rows"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_corrupt"))
        .orderBy(col("source").asc_nulls_first)
    },
    sql = Some("""
      WITH g AS (
        SELECT CASE WHEN doc_id % 50 = 0 THEN NULL ELSE source END
                 AS source,
               CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END AS corrupt
        FROM documents)
      SELECT source, COUNT(*) AS n_rows,
             CAST(SUM(corrupt) AS BIGINT) AS n_corrupt
      FROM g
      GROUP BY source
      ORDER BY source NULLS FIRST"""))

  val all: Seq[Q] = Seq(src1JsonlRoundtrip, src2CsvRoundtrip,
    src3SchemaEvolution, src4JsonlCorruptChannel)
}

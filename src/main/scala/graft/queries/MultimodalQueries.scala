package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Multimodal (binary-column) queries, both fully oracle-checked: md1
  * hashes the binary payloads; md2 runs the stubbed decode through the
  * partition-local batch pipeline and DuckDB re-derives the 16-bin byte
  * histogram from the hex encoding of the same bytes — float32
  * division included, so the hash check is bit-exact.
  */
object MultimodalQueries {

  /** Binary payload statistics: byte length + md5 of the binary —
    * exercises binary-typed columns end to end (cast, hash, aggregate).
    */
  val md1BinaryStats = Q(
    "md1_binary_stats",
    (s, d) =>
      MultimodalOps.mediaFromDocuments(s, d).toDF()
        .select(col("media_id"), col("mime"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy(col("media_id")),
    sql = Some("""
      SELECT doc_id AS media_id, 'text/plain' AS mime,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5
      FROM documents
      ORDER BY media_id"""))

  /** Stubbed decode + feature extraction through the partition-local
    * batch pipeline. Oracle: per-byte high nibble = the odd-position
    * hex digit of `hex(encode(text))`; bins divided in FLOAT (float32,
    * matching the stub's `Array[Float]`) before the double widening,
    * so f0 and f_sum agree bit-for-bit.
    */
  val md2Features = Q(
    "md2_feature_extract",
    (s, d) => {
      val feats = MultimodalOps.extractFeatures(
        MultimodalOps.mediaFromDocuments(s, d))
      feats.toDF()
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 6)
            .as("f0"),
          round(aggregate(col("features"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("f_sum"))
        .orderBy(col("media_id"))
    },
    sql = Some("""
      WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS n,
               lower(hex(encode(text))) AS hx
        FROM documents),
      bins AS (
        SELECT doc_id, n,
          list_transform(['0','1','2','3','4','5','6','7',
                          '8','9','a','b','c','d','e','f'],
            dg -> CASE WHEN n = 0 THEN CAST(0 AS FLOAT)
                  ELSE CAST(len(list_filter(range(0, n),
                         i -> substr(hx, 2*i+1, 1) = dg)) AS FLOAT)
                       / CAST(n AS FLOAT) END) AS bins
        FROM b)
      SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_bytes,
             ROUND(CAST(bins[1] AS DOUBLE), 6) AS f0,
             ROUND(list_sum(list_transform(bins,
               x -> CAST(x AS DOUBLE))), 6) AS f_sum
      FROM bins
      ORDER BY media_id"""))

  val all: Seq[Q] = Seq(md1BinaryStats, md2Features)
}

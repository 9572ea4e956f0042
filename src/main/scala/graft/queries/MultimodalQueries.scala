package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Multimodal (binary-column) queries. md1 is fully oracle-checked
  * (byte lengths + content hashes of the binary payloads); md2 runs the
  * stubbed decode plumbing and is rows-only checked (its correctness is
  * asserted by MultimodalOpsSpec against known inputs — a media decoder
  * is not expressible in the SQL oracle).
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
    * batch pipeline (rows-only driver check; content asserted in spec).
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
    sql = None)

  val all: Seq[Q] = Seq(md1BinaryStats, md2Features)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: fixed token windows with
  * overlap (stride < size), one output row per chunk.
  *
  * Implementation notes: the token array is materialized as a column
  * BEFORE the generator (a lambda-free `slice` on a column reference —
  * the per-element re-evaluation trap documented in TextDedupOps does
  * not apply), and the chunk grid is a `sequence` posexplode — fully
  * codegen-friendly, no UDFs, no shuffle (chunking is scan-local;
  * downstream ops pick their own keys).
  */
object ChunkingOps {

  /** One row per (doc, chunk): chunk_id, chunk token count, chunk text.
    * Chunk starts at stride*i; the final partial window is kept iff it
    * has at least one token not covered by the previous chunk.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = org.apache.spark.sql.functions.size(col("toks"))
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(floor((n - 1) / lit(stride)).cast("int"), lit(0))))
          .as(Seq("chunk_id", "i")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("i") * stride + 1, lit(size)).as("ctoks"))
      .filter(org.apache.spark.sql.functions.size(col("ctoks")) > 0)
      .select(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("ctoks")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
  }
}

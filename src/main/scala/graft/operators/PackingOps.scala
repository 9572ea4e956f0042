package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data assembly: lay a stream's
  * documents end-to-end in a deterministic order and cut fixed-capacity
  * token sequences across the concatenation (documents straddle
  * sequence boundaries — the GPT-style "concat then chunk" packing
  * that wastes no pad tokens). The manifest maps every document to the
  * half-open token range it occupies and the sequences it spans; the
  * actual example writer is a deterministic function of (manifest,
  * tokenizer) downstream.
  *
  * Scale shape: packing is PER STREAM (`streamCol` — a source shard,
  * a corpus slice), never global — a global concatenation order would
  * serialize the corpus through one range exchange for zero training
  * benefit. One hash exchange on `streamCol`, then a per-partition
  * window sort; both token counting and the offset arithmetic are
  * scan-local expressions.
  */
object PackingOps {

  /** Per-document packing manifest: `(stream, id, n_tokens, start_off,
    * seq_first, seq_last, n_seqs)` where offsets count whitespace
    * tokens from the stream's start and sequence indices are
    * `offset div capacity`. Integer division keeps every derived
    * column exact (bit-identical across engines and partitionings).
    */
  def packManifest(docs: DataFrame, streamCol: String, idCol: String,
      textCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
    docs
      .withColumn("n_tokens",
        size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("seq_first", expr(s"start_off div $capacity"))
      .withColumn("seq_last", expr(s"(end_off - 1) div $capacity"))
      .select(col(streamCol), col(idCol), col("n_tokens"), col("start_off"),
        col("seq_first"), col("seq_last"),
        (col("seq_last") - col("seq_first") + lit(1L)).as("n_seqs"))
  }
}

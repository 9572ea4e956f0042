package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-step BPE vocabulary induction (byte-pair-encoding trainer
  * loop) — the iterated form of tx18's single merge step, built on the
  * em7 template: each iteration makes ONE bounded driver decision (the
  * top pair) over a distributed pair count, then re-symbolizes via the
  * merged vocabulary entirely inside the scan (an array fold — no
  * extra shuffle, no driver-side corpus state).
  *
  * Scale shape: the only corpus-size stage is the word explode + count
  * that builds the distinct-word table — computed ONCE and cached
  * (classic BPE-trainer optimization: billions of word instances,
  * millions of distinct words). Every iteration after that runs at
  * distinct-word scale: one map-side-combinable hash agg over adjacent
  * symbol pairs + TakeOrderedAndProject for the top-k, never a window
  * or global sort. Driver state across iterations is exactly the O(N)
  * merge table (`steps × topK` rows).
  */
object BpeOps {

  /** Distinct words + frequencies (tx18's word stage). */
  def words(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial symbolization: one single-character symbol per position. */
  def charSyms(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Apply ONE merge rule (a, b) → ab to a symbol sequence, greedy
    * left-to-right (the standard BPE application order), as a
    * scan-local array fold: merge the current symbol into the
    * accumulator's top when (top, current) == (a, b). A symbol merged
    * THIS pass can never re-merge as the left side — its text is a+b,
    * which equals `a` only if `b` were empty — so the fold is exactly
    * the skip-two greedy scan without needing a consumed marker.
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, expr("CAST(array() AS array<string>)"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Frequency-weighted adjacent-pair counts of the current
    * symbolization (`freq`, `syms` columns). Fully merged single-symbol
    * words carry no pairs.
    */
  def pairCounts(st: DataFrame): DataFrame =
    st.filter(size(col("syms")) > 1)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1), i =>
          concat(element_at(col("syms"), i), lit(" "),
            element_at(col("syms"), i + 1)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))

  /** Train `steps` BPE merges over `docs`' text column; returns the
    * merge table (step, rank, pair, n) with the top `topK` candidates
    * of each round (rank 1 is the applied merge). The word table is
    * cached once (lifetime: q20/sim4 pattern — long-lived sessions
    * clearCache() between queries; Verify does); per-iteration work is
    * the pair agg + top-k + a `topK`-row collect.
    */
  def trainMerges(docs: DataFrame, steps: Int, topK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w0 = words(docs)
      .select(col("freq"), charSyms(col("w")).as("syms"))
      .persist()
    var st = w0
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    for (k <- 1 to steps) {
      val top = pairCounts(st)
        .orderBy(col("n").desc, col("pair"))
        .limit(topK)
        .collect() // bounded driver decision: topK merge-table rows
      require(top.nonEmpty, s"BPE step $k: no pairs left to merge")
      top.zipWithIndex.foreach { case (r, i) =>
        merges += ((k.toLong, i + 1L, r.getString(0), r.getLong(1)))
      }
      val Array(a, b) = top.head.getString(0).split(" ", 2)
      st = st.withColumn("syms", applyMerge(col("syms"), a, b))
    }
    merges.toSeq.toDF("step", "rank", "pair", "n")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Window-free GLOBAL RANK — q20's distributed-NTILE machinery
  * ([[graft.queries.Analytics2]]) factored into a reusable operator.
  *
  * A `Window.orderBy` with no partitionBy funnels every row through a
  * single task — guaranteed OOM/straggler at 100 TB — so the global
  * 1-based rank is assembled distributively instead:
  *
  *   - range repartition on the sort keys (partition order follows the
  *     sort order),
  *   - partition-local sort + local row index
  *     (`monotonically_increasing_id` low 33 bits — counts rows in
  *     partition-local order),
  *   - per-partition row counts → cumulative offsets (a partitions²
  *     self-join over ONE ROW PER PARTITION — metadata-sized at any
  *     data scale, and window-free itself),
  *   - grank = offset(partition) + local index + 1.
  *
  * Output is bit-identical to `ROW_NUMBER() OVER (ORDER BY keys)`
  * PROVIDED `sortCols` is a TOTAL order (always tie-break on a unique
  * id). The input is scope-cached ([[org.apache.spark.sql.graft
  * .ScopedCaches]]) because three consumers would otherwise re-plan
  * the scan + range exchange per consumer.
  */
object RankOps {

  /** `df` + `grank` (1-based global rank by `sortCols`) + `n_total`
    * (total row count — the companion an order-statistic consumer
    * always needs).
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      parts: Int): DataFrame = {
    require(sortCols.nonEmpty, "global rank needs at least one sort key")
    val base = org.apache.spark.sql.graft.ScopedCaches.scoped(df
      .repartitionByRange(math.max(parts, 2), sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", monotonically_increasing_id()
        .bitwiseAND(lit((1L << 33) - 1))))
    val counts = base.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      // lrn is the LOW 33 BITS of monotonically_increasing_id: a range
      // partition holding >= 2^33 rows would silently wrap and corrupt
      // ranks. Fail loud; at that size, raise `parts`.
      .withColumn("cnt", when(col("cnt") >= (1L << 33),
          raise_error(concat(lit("withGlobalRank: range partition holds "),
            col("cnt").cast("string"),
            lit(" rows >= 2^33; local row index would wrap — raise" +
              " `parts`"))))
        .otherwise(col("cnt")))
    val offs = counts.as("a")
      .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
    val tot = counts.agg(sum(col("cnt")).as("n_total"))
    base.join(broadcast(offs), Seq("pid"))
      .crossJoin(broadcast(tot)) // 1-row scalar
      .withColumn("grank", col("off") + col("lrn") + lit(1L))
      .drop("pid", "lrn", "off")
  }
}

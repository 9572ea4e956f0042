package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One registered query: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle equivalent over the same parquet
  * tables. Column names of `fn`'s result and `sql`'s result MUST match
  * (the driver sorts columns by name and hash-compares values).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
    /** Headline queries run by Bench. */
    bench: Boolean = false)

object Q {

  /** Exact, order-independent floating-point sum: route the (per-row
    * deterministic) double expression through DECIMAL so Spark's
    * partition-parallel summation and DuckDB's sequential summation
    * produce bit-identical doubles. Mirror in SQL as
    * `CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, both sides
    * computing `CAST(sum AS DOUBLE) / COUNT(*)` identically.
    */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1)))

  /** SQL fragment for dsum. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  /** SQL fragment for davg. */
  def sqlDavg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"

  /** Long-typed count helper (Spark count is already LongType). */
  def cnt: Column = count(lit(1))

  /** Spread a narrow SCAN across all cores before a compute-bound
    * stage. The synthetic tables are single parquet files (one input
    * split), so without this a CPU-heavy projection (hashing, vector
    * math) runs on one core. Conditional: when the scan already yields
    * at least core-count partitions (any real cluster input), the
    * round-robin exchange would be a pure waste and is skipped.
    *
    * Scan-level inputs ONLY: `.rdd` on a shuffle-bearing plan would
    * eagerly materialize AQE query stages (running real jobs whose
    * results are discarded). Guarded here — if the plan contains any
    * shuffle-introducing operator the input is returned unchanged
    * rather than probed, so misuse degrades to a no-op instead of
    * hidden job execution.
    */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffles = df.queryExecution.analyzed.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Window | _: Distinct |
                _: Deduplicate | _: RepartitionOperation | _: Sort) => p
    }
    if (shuffles.nonEmpty) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      // on a shuffle-free plan .rdd just plans the scan (no job)
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives. AQE handles skewed *joins* at runtime;
  * for aggregations over power-law keys (the classic event-log shape:
  * one user = 20% of rows), two-stage salted aggregation removes the
  * single-reducer hotspot: stage 1 aggregates on (key, salt) —
  * hot keys split across `saltBuckets` reducers — stage 2 merges the
  * partials per key. Exact for algebraic aggregates (count/sum/min/
  * max); the DECIMAL-routed sums keep the merge order-independent, so
  * the salted result is bit-identical to the direct groupBy.
  */
object SkewOps {

  /** Deterministic salt in [0, buckets) from arbitrary tiebreak
    * columns (NOT rand() — reproducibility matters for tests/oracles;
    * entropy source is a hash of the row's natural id columns).
    */
  def salt(buckets: Int, entropy: Column*): Column =
    pmod(hash(entropy: _*), lit(buckets))

  /** Two-stage count+sum aggregation by `key`, salted `buckets` ways.
    * sumCol is DECIMAL-routed (exact merge).
    */
  def saltedCountSum(df: DataFrame, key: Column, sumCol: Column,
      buckets: Int, entropy: Column*): DataFrame =
    df.groupBy(key.as("k"), salt(buckets, entropy: _*).as("s"))
      .agg(count(lit(1)).as("partial_n"),
        sum(sumCol.cast("decimal(18,6)")).as("partial_sum"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"),
        sum(col("partial_sum")).cast("double").as("total"))
}

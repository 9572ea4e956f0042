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

  /** Salted shuffle JOIN — the manual skew-join rewrite for when AQE
    * can't help (AQE splits skewed partitions only for sort-merge
    * after a stage materializes; a pre-planned salt bounds EVERY
    * reducer up front, the shape streaming/bucketed pipelines need).
    * The fact (skewed) side gets a deterministic salt in [0, salt)
    * from its `entropy` columns; the dim side replicates each row
    * `salt` ways; the join key becomes (key, salt) — a hot key's rows
    * spread over `salt` reducers instead of one. Exact: every fact
    * row meets each matching dim row exactly once (at its own salt
    * copy). The shuffle_hash hint pins the shuffled-join shape the
    * salt exists for (a broadcast would make it pointless — and at
    * skew scale the dim is too big to broadcast). Dim-side cost:
    * `salt`× replication — keep `salt` at the reducer-imbalance
    * scale (8-32), far below dim row count.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, entropy: Column*): DataFrame = {
    val f = fact.withColumn("__salt", salt(saltBuckets, entropy: _*))
    val d = dim.select(col("*"),
      explode(array((0 until saltBuckets).map(lit(_)): _*)).as("__salt"))
    f.join(d.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}

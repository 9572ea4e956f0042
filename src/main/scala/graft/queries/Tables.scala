package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loading helpers for the driver-provided synthetic tables
  * (TESTDATA.md): TPC-H-ish star schema + `events`, `documents`,
  * `embeddings`, one parquet file per table under the sf dir.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonicalize `events.ts` to LongType epoch-NANOS. The driver's
    * testdata has shipped `ts` as INT64 TIMESTAMP(NANOS) (arriving as
    * LongType via `spark.sql.legacy.parquet.nanosAsLong`) and, since
    * r9, as parquet `timestamp[us]` (TIMESTAMP_NTZ). Every query and
    * stream in the engine does integer arithmetic on epoch-nanos, so
    * the type split is absorbed HERE, once, instead of at 30 call
    * sites. Session timezone is UTC (GraftSession), so the NTZ→TZ cast
    * preserves the wall-clock micros as epoch micros — the same value
    * DuckDB's `epoch_us(ts)` sees on the oracle side.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (want LONG ns or TIMESTAMP)")
    }

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

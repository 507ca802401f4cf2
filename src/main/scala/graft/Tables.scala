package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated testdata tables.
  *
  * All queries receive a scale-factor directory (`/root/testdata/sfX`)
  * at call time; nothing is cached across scale factors. Reads go
  * straight through `spark.read.parquet` so Catalyst can push filters
  * and prune columns into the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** The ONE ns→µs timestamp rebuild both the batch and streaming
    * events readers apply. MUST be integer division (`div`): `/` on a
    * Column is double division, and epoch-ns values (~1.7e18) exceed
    * 2^53, so the double path is off by 1 µs for a large fraction of
    * rows — silently diverging from the oracle's exact `epoch_us`.
    * (Some scale factors carry full-ns precision; truncation direction
    * matches DuckDB for positive epochs.) */
  def nsToMicros(df: DataFrame): DataFrame =
    df.withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * map to TimestampType. Read nanos as long (legacy conf, runtime
    * settable) and rebuild a microsecond TimestampType column via
    * [[nsToMicros]] so every downstream operator sees a normal
    * timestamp. The conf intentionally stays set for the session:
    * restoring it after the lazy read would risk the scan executing
    * without it, and graft sessions own their configuration (any
    * other TIMESTAMP(NANOS) table in the session should come through
    * a reader like this one anyway). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nsToMicros(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

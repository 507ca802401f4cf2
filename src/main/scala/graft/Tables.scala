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

  /** Normalize whatever physical shape `events.ts` arrived in to the
    * session-UTC microsecond `TimestampType` every downstream operator
    * expects. The driver's generator has shipped this column as parquet
    * TIMESTAMP(NANOS) (→ `LongType` under the legacy conf) in some
    * rounds and TIMESTAMP(MICROS) (→ `TimestampType` or
    * `TimestampNTZType` depending on isAdjustedToUTC) in others, so the
    * reader branches on the loaded dtype instead of assuming one:
    *   - `LongType`   — legacy nanos-as-long read → [[nsToMicros]].
    *   - `TimestampType` — already session-UTC micros, use directly.
    *   - `TimestampNTZType` — naive micros; cast reinterprets the wall
    *     time in the session zone, which graft pins to UTC, so the
    *     underlying micros are preserved exactly (matches the DuckDB
    *     oracle's precision-agnostic `epoch_us(ts)`).
    * Anything else fails loudly rather than silently mis-timestamping. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => nsToMicros(df)
      case TimestampType    => df
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected INT64 nanos, " +
            "TIMESTAMP(MICROS) or TIMESTAMP_NTZ(MICROS)")
    }
  }

  /** Events reader. `spark.sql.legacy.parquet.nanosAsLong` stays set so
    * a TIMESTAMP(NANOS) file loads as `LongType` instead of throwing;
    * the conf is a no-op for micros files. The conf intentionally stays
    * set for the session: restoring it after the lazy read would risk
    * the scan executing without it, and graft sessions own their
    * configuration. Schema differences are then absorbed by
    * [[normalizeEventsTs]]. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** Embeddings reader, schema-adaptive like [[events]]: every vector
    * operator (distances, index builds, quantizers) contracts on
    * `array<float>`, and a driver-side regeneration that ships the
    * column as `array<double>` (pyarrow's default for Python floats)
    * would otherwise take out the whole ANN family at once — the same
    * failure class as round 8's events.ts encoding drift. A float
    * file passes through untouched (no cast node in the plan). */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding")
            .cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalStateException(
          s"embeddings.embedding has unsupported type $other; " +
            "expected array<float> or array<double>")
    }
  }
}

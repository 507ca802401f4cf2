package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression pin for the events reader's timestamp handling.
  *
  * The driver's testdata generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) in some rounds and TIMESTAMP(MICROS) (NTZ) in
  * others; round 8 went red because the reader assumed one shape. This
  * spec writes one tiny fixture per physical shape Spark can produce
  * and asserts [[Tables.events]] normalizes every one of them to the
  * same session-UTC µs TimestampType values, so a driver-side data
  * regeneration can never silently take the events family out again.
  */
class EventsReaderSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  // 2023-11-14T22:13:20.123456789Z — sub-µs tail checks ns truncation.
  private val NsA = 1700000000123456789L
  private val NsB = 1700000100987654321L
  private val UsA = 1700000000123456L // NsA div 1000
  private val UsB = 1700000100987654L

  private def fixtureDir(tag: String): String = {
    val d = s"/tmp/graft_events_fixture_$tag"
    val p = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    d
  }

  private def assertNormalized(dir: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    val got = ev.select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, UsA), (2L, UsB)))
  }

  test("INT64 nanos-as-long fixture rebuilds exact microseconds") {
    // The legacy nanosAsLong read of a TIMESTAMP(NANOS) column surfaces
    // as LongType; a plain INT64 column exercises the identical branch
    // (Spark 4 cannot write TIMESTAMP(NANOS) itself).
    val dir = fixtureDir("long")
    Seq((1L, NsA), (2L, NsB)).toDF("event_id", "ts")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    assertNormalized(dir)
  }

  test("TIMESTAMP(MICROS) UTC-adjusted fixture passes through") {
    val dir = fixtureDir("ltz")
    Seq((1L, UsA), (2L, UsB)).toDF("event_id", "us")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    assertNormalized(dir)
  }

  test("TIMESTAMP_NTZ(MICROS) fixture casts losslessly in the UTC session") {
    // This is the shape the driver's pyarrow generator writes
    // (timestamp[us], isAdjustedToUTC=false) as of round 8.
    val dir = fixtureDir("ntz")
    Seq((1L, UsA), (2L, UsB)).toDF("event_id", "us")
      .withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType)).drop("us")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    val ntzBack = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(ntzBack == TimestampNTZType, s"fixture must round-trip NTZ, got $ntzBack")
    assertNormalized(dir)
  }

  test("streaming events reader matches the batch normalization") {
    val st = graft.streaming.StreamOps
      .eventsStream(spark, "/root/testdata/sf0.001")
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType)
  }

  test("current driver testdata loads and is non-empty at every SF") {
    Seq(SparkSpecBase.sf001, SparkSpecBase.sf01).foreach { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType)
      assert(ev.limit(1).count() == 1L)
    }
  }

  test("embeddings reader normalizes array<double> drift to array<float>") {
    // same failure class as the events.ts drift: a pyarrow
    // regeneration shipping doubles would break every vector operator
    val dir = fixtureDir("embdbl")
    Seq((1L, Array(0.5, -1.25)), (2L, Array(3.0, 4.0)))
      .toDF("vec_id", "embedding")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val emb = Tables.embeddings(spark, dir)
    assert(emb.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = false))
    val got = emb.orderBy($"vec_id").as[(Long, Array[Float])].collect()
    assert(got(0)._2.sameElements(Array(0.5f, -1.25f)) &&
      got(1)._2.sameElements(Array(3f, 4f)))
    // and the real float testdata passes through with NO cast node
    val real = Tables.embeddings(spark, SparkSpecBase.sf001)
    assert(real.schema("embedding").dataType.isInstanceOf[ArrayType])
    assert(!real.queryExecution.analyzed.toString.toLowerCase.contains("cast(embedding"),
      "float-file read must not insert a cast")
  }
}

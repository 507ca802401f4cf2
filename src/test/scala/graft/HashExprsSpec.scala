package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{HashExprs, SharedHash}

/** Pins the native hash expressions to the SQL fragments they replace
  * (which are in turn what the DuckDB oracle evaluates). */
class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("native RollingHash == SQL aggregate fragment") {
    val df = Seq("hello world", "a", "", "spark graft", "zzz 123 !?")
      .toDF("s").filter(length($"s") >= 1)
    val both = df.select(
      HashExprs.rollHash($"s").as("native"),
      expr(SharedHash.sparkRoll("s")).as("sql")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("native SimHash62 == SQL fragment on token hashes") {
    val df = Seq("the quick brown fox", "spark spark spark streams", "one")
      .toDF("text")
      .withColumn("words", split($"text", " "))
      .withColumn("th", transform($"words", w => HashExprs.rollHash(w)))
    val both = df.select(
      HashExprs.simHash62($"th").as("native"),
      expr(SharedHash.sparkSimhash("th")).as("sql")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for Spark-backed suites. */
object SparkSpecBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // match the mains: hash-agg headroom for query-set-sized TopK
      // groups (rationale at the Bench builder)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "32768")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
  val sf1 = "/root/testdata/sf0.1"
}

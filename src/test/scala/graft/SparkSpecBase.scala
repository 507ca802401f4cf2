package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for Spark-backed suites. */
object SparkSpecBase {
  lazy val spark: SparkSession = {
    // GRAFT_TEST_CPUS widens the session for env-gated scale
    // rehearsals (the 2M-vector probe needs local[32]); default stays
    // the cheap 4-thread session every ordinary suite expects
    val cpus = sys.env.getOrElse("GRAFT_TEST_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // match the mains: hash-agg headroom for query-set-sized TopK
      // groups (rationale at the Bench builder; 128 Ki clears the
      // ×1000 rehearsal's 40k-query set — the old 32 Ki test value
      // had drifted below the mains and would have put Vec2MSpec's
      // 40k TopK groups on the sort-spill path)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
  val sf1 = "/root/testdata/sf0.1"
}

package graft.examples

import org.apache.spark.sql.SparkSession
import graft._
import graft.index._

/** Phase profiler for the serving job path — the measurement tool
  * behind the r15 resident-tier work (it showed the 0.5 s sf0.1 serve
  * wall was ~0.2 s query-batch re-collect + ~0.15 s row
  * deserialization/graph rebuild + ~0.15 s job fixed cost, and only
  * microseconds of beam search). Run via
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.examples.ProfileServe"`;
  * prints PROF lines for the cache-build, query-collect, warm-serve,
  * and precollected-serve phases. Not part of the library surface. */
object ProfileServe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t("build+cache plain")(VamanaIndex.cachedIndex(spark, dir).count())
    t("cache pivots")(VamanaIndex.cachedPivots(spark, dir).length)
    t("build+cache overlap")(VamanaIndex.cachedOverlapIndex(spark, dir).count())
    t("cache overlap pivots")(VamanaIndex.cachedOverlapPivots(spark, dir).length)
    val q = t("queriesArr collect")(VamanaIndex.queriesArr(spark, dir))
    println(s"nqueries=${q.length} dim=${q.head._2.length}")
    for (i <- 1 to 3)
      t(s"qOverlapServe full $i")(
        VamanaIndex.qOverlapServe(spark, dir).queryExecution.toRdd.count())
    t("queriesArr again")(VamanaIndex.queriesArr(spark, dir))
    val ov = VamanaIndex.cachedOverlapIndex(spark, dir)
    val pv = VamanaIndex.cachedOverlapPivots(spark, dir)
    for (i <- 1 to 3)
      t(s"searchProbed precollected $i")(
        VamanaIndex.searchProbed(ov, q, 10, 64, VamanaIndex.qParams, 4,
          excludeSelf = true, pivots = Some(pv), distinctMerge = true)
          .queryExecution.toRdd.count())
    // single-query job-path latency: AQE's per-exchange stage
    // materialization is a fixed driver round-trip that dwarfs a
    // 40-row serving shuffle — measure both settings
    val one = Array(q.head)
    def lat(): Double = {
      val t0 = System.nanoTime()
      VamanaIndex.searchProbed(VamanaIndex.cachedIndex(spark, dir), one, 10, 64,
        VamanaIndex.qParams, 4,
        excludeSelf = true, pivots = Some(VamanaIndex.cachedPivots(spark, dir)))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for (aqe <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val xs = (1 to 15).map(_ => lat()).sorted
      println(f"PROF single-query lat aqe=$aqe%-5s p50 ${xs(7) * 1000}%.1f ms  " +
        f"p95 ${xs(13) * 1000}%.1f ms")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}

package graft

/** Transient diagnostic: attribute the bench tail's "task of very
  * large size" warning to a specific serving probe (run manually). */
object TaskSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    val dir = "/root/testdata/sf0.1"
    def mark(name: String)(f: => Any): Unit = {
      System.err.println(s"[diag ${System.currentTimeMillis()}] begin $name")
      try f catch { case e: Throwable =>
        System.err.println(s"[diag] $name failed: ${e.getMessage}") }
      System.err.println(s"[diag ${System.currentTimeMillis()}] end $name")
    }
    mark("warm_index") { index.VamanaIndex.cachedIndex(spark, dir).count() }
    mark("warm_pivots") { index.VamanaIndex.cachedPivots(spark, dir) }
    mark("qps_probed") { index.VamanaIndex.qVamanaProbed(spark, dir).count() }
    mark("recall") { index.VamanaIndex.probedRecall(spark, dir) }
    mark("full_search") { index.VamanaIndex.qVamanaSearch(spark, dir).count() }
    mark("full_recall") { index.VamanaIndex.qVamanaRecall(spark, dir).count() }
    mark("recall100") { index.VamanaIndex.probedRecallAt(spark, dir, 100) }
    mark("recall100_full") { index.VamanaIndex.fullRecallAt(spark, dir, 100) }
    mark("warm_overlap") { index.VamanaIndex.cachedOverlapIndex(spark, dir).count() }
    mark("overlap_pivots") { index.VamanaIndex.cachedOverlapPivots(spark, dir) }
    mark("overlap_serve") { index.VamanaIndex.qOverlapServe(spark, dir).count() }
    mark("overlap_recall") { index.VamanaIndex.probedRecallOverlap(spark, dir) }
    mark("build_fresh") {
      index.VamanaIndex.build(Tables.embeddings(spark, dir),
        index.VamanaIndex.qParams, index.VamanaIndex.qShards)
        .queryExecution.toRdd.count()
    }
    mark("latencies_job") { index.VamanaIndex.probedLatencies(spark, dir) }
    mark("latencies_local") { index.VamanaIndex.localLatencies(spark, dir) }
    index.VamanaIndex.releaseCaches()
    spark.stop()
  }
}

package graft

/** One-off measurement harness (Test scope, run by hand):
  * recall@100 of the routed search across nprobe values and the
  * overlap-2 tier, to pick the documented large-k operating point.
  * `sbt "Test/runMain graft.Recall100Probe /root/testdata/sf0.1"`
  */
object Recall100Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSpecBase.spark
    import graft.index.VamanaIndex._
    val k = 100
    val exact = graft.operators.VectorQueries.qKnnExactK(spark, dir, k)
    exact.cache().count()
    val idx = cachedIndex(spark, dir)
    val pv = cachedPivots(spark, dir)
    val qs = Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.expr("vec_id % 50 = 0"))
      .selectExpr("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    for (np <- Seq(4, 5, 6, 8); beamMult <- Seq(2, 4)) {
      val t0 = System.nanoTime()
      val approx = searchProbed(idx, qs, k, beamMult * k, qParams,
        nprobe = np, excludeSelf = true, pivots = Some(pv))
      val r = recallDf(approx, exact).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE nprobe=$np beam=${beamMult * k} recall@100=$r%.4f  (${dt}%.2f s)")
    }
    val ov = cachedOverlapIndex(spark, dir)
    for (np <- Seq(4, 6); beamMult <- Seq(2, 4)) {
      val t0 = System.nanoTime()
      val approx = searchProbed(ov, qs, k, beamMult * k, qParams,
        nprobe = np, excludeSelf = true, distinctMerge = true,
        pivots = Some(cachedOverlapPivots(spark, dir)))
      val r = recallDf(approx, exact).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"OVERLAP nprobe=$np beam=${beamMult * k} recall@100=$r%.4f  (${dt}%.2f s)")
    }
    spark.stop()
  }
}

package graft

/** Transient r18 diagnostic: output row counts of the pair-emitting
  * dedup queries at sf0.1 — which ones pay the orderBy's
  * double-compute (range sampling re-runs the kernel) on a large
  * output. */
object OutputSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    operators.Dedup.warm(spark, dir)
    Seq(
      "q_dedup_simhash", "q_dedup_simhash_rep", "q_dedup_jaccard",
      "q_dedup_embed", "q_dedup_substring", "q_dedup_substring_rep",
      "q_dedup_cuts", "q_dedup_minhash", "q_dedup_cluster",
      "q_dedup_cluster_rep", "q_dedup_semantic", "q_dedup_exact"
    ).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      println(f"[size] $name%-26s $n%10d rows ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
  }
}

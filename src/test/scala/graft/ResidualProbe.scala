package graft

/** Transient measurement probe for the residual-vs-free comparison
  * (run manually; not a suite). */
object ResidualProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val corpus = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
      val queries = corpus.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("qv"))
      val exact = plans.KnnJoin(corpus, queries, 10, "l2", excludeSelf = true)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
        .toSeq.toDF("q_id", "neighbor_id")
      def rec(df: org.apache.spark.sql.DataFrame): Double =
        index.VamanaIndex.recallDf(df.select($"q_id", $"neighbor_id"), exact)
          .head().getDouble(0)
      // probe ceiling: exact L2 within probed cells (the IVF limit)
      val ceil = rec(operators.VectorQueries.queries("q_knn_ivf")(spark, dir))
      val free = rec(operators.PQ.qKnnIvfPq(spark, dir))
      val res = rec(operators.PQ.qKnnIvfPqRes(spark, dir))
      println(f"[probe] dir=$dir ceiling=$ceil%.4f free=$free%.4f res=$res%.4f")
      operators.PQ.release(spark)
      operators.VectorQueries.release(spark)
    }
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.plans.{GraftExtensions, KnnJoin, KnnJoinExec}

class KnnJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("custom KnnJoin operator output == declarative exact kNN") {
    val got = operators.VectorQueries.qKnnCustom(spark, SparkSpecBase.sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exp = operators.VectorQueries.qKnnExact(spark, SparkSpecBase.sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.sameElements(exp))
  }

  test("KnnJoinExec appears in the physical plan (strategy fires)") {
    val df = operators.VectorQueries.qKnnCustom(spark, SparkSpecBase.sf001)
    // AdaptiveSparkPlanExec hides children from `exists`; check the
    // full rendered tree instead
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(p.contains("KnnJoin"), p)
  }

  test("tiny corpus, l2 metric, ties and self handled") {
    val corpus = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Array(0.1f, 0f))).toDF("q_id", "qv")
    val nn = KnnJoin(corpus, queries, k = 2, metric = "l2")
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    assert(nn.sameElements(Array(1L, 2L)))
    // k larger than corpus: returns all rows, no padding
    val all = KnnJoin(corpus, queries, k = 10, metric = "l2").count()
    assert(all == 3)
  }
}

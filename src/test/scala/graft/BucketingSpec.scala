package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: pre-bucketing both sides of a
  * recurring join key eliminates the join shuffle entirely — at 100 TB
  * the difference between re-shuffling the fact table on every query
  * and reading pre-clustered files. The assertion pins the plan:
  * SortMergeJoin with NO Exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  // warehouse.dir is a static conf; tables land in ./spark-warehouse
  // (gitignored)
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("bucketed lineitem ⋈ orders join plans without a shuffle") {
    val li = Tables.lineitem(spark, SparkSpecBase.sf001)
    val o = Tables.orders(spark, SparkSpecBase.sf001)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previous JVM's in-memory catalog may have orphaned the dirs
    Seq("li_b", "o_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"spark-warehouse/$t"))
    }
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    // force the sort-merge path: at this test scale the optimizer
    // would broadcast (also shuffle-free, but then bucketing is moot)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b").hint("merge"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(round(sum($"l_extendedprice"), 4).as("rev"))

      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself must not introduce exchanges: the only allowed
      // exchange is the one for the final small aggregation
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate"))
      assert(!joinSection.contains("Exchange"), plan)

      // and the result matches the plain (shuffled) join
      val expected = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(round(sum($"l_extendedprice"), 4).as("rev"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}

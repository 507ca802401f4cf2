package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioned parquet sink: documents written partitioned by lang
  * must produce one directory per lang, and a lang-filtered read must
  * prune to that partition (the layout a 100 TB corpus ships with so
  * language-specific jobs touch 1/N of the files). */
class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("partitionBy(lang) write → partition-pruned read") {
    val out = "/tmp/graft_part_docs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val docs = Tables.documents(spark, SparkSpecBase.sf001)
    docs.write.partitionBy("lang").parquet(out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh")), dirs.toSeq)

    val en = spark.read.parquet(out).filter($"lang" === "en")
    val plan = en.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(en.count() == docs.filter($"lang" === "en").count())
  }
}

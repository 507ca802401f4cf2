package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode

/** Standing whole-surface plan audit: constructs every SparkEntry
  * query's physical plan at sf0.001 and logs its shape counters
  * (parquet scans, exchanges, joins, cache reads) so plan regressions
  * are visible in CI logs round over round. One hard gate: no query
  * may ever plan a `CartesianProduct` — every pair-generation path in
  * the engine is broadcast-, bucket-, or band-based by design
  * (deliberate broadcast NLJs like q_medoid's are a different node
  * and stay allowed). Per-query shape pins live in [[PlanSpec]]. */
class PlanAuditProbe extends AnyFunSuite {
  test("every query plans without a CartesianProduct; shapes logged") {
    val spark = SparkSpecBase.spark
    val sf = SparkSpecBase.sf001
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, sf).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
      val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).length
      val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
      val joins = """\(\d+\) \w*Join""".r.findAllIn(p).length
      val cached = "InMemoryTableScan".r.findAllIn(p).length
      info(f"$name%-22s scans=$scans%-3d exchanges=$exchanges%-3d " +
        f"joins=$joins%-3d cacheReads=$cached%-3d")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** The r3 verdict flagged q_pack_chunks / q_value_pctl: both windowed
  * over a low-cardinality key (source / event_type), which sorts each
  * whole stratum in ONE task — correct, but serial at 100 TB. Round 4
  * replaced them with hierarchical prefix-sum / distributed rank
  * selection. These specs pin (a) exact equivalence to the window
  * forms, which remain the semantic reference (and the oracle SQL's
  * shape), and (b) the plan property that made the rewrite worthwhile:
  * no Window operator — i.e. no single-task whole-stratum sort —
  * anywhere in the physical plan.
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  private val sf = SparkSpecBase.sf01

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q_pack_chunks: hierarchical prefix sum matches the window form exactly") {
    val fast = rows(operators.TextAnalysis.qPackChunks(spark, sf))
    val ref = rows(operators.TextAnalysis.qPackChunksWindow(spark, sf))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("q_pack_chunks: no Window operator (no single-task stratum sort)") {
    val p = planOf(operators.TextAnalysis.qPackChunks(spark, sf))
    assert(!p.contains("Window"), s"stratum window reintroduced:\n$p")
    // the prefix-sum passes run over an RDD lineage rooted at the
    // range-partitioned cache, so the SQL plan's only input is that
    // external RDD — a Window/hash-on-source exchange reappearing here
    // would mean the rewrite regressed to the serial form
    assert(p.contains("mapPartitionsWithIndex"), p)
    assert(!p.contains("hashpartitioning(source"), p)
    // and the semantic reference really is the serial shape we avoided
    val ref = planOf(operators.TextAnalysis.qPackChunksWindow(spark, sf))
    assert(ref.contains("Window"), ref)
  }

  test("q_value_pctl: distributed rank selection matches the window form exactly") {
    val fast = rows(operators.Relational.valuePctl(spark, sf))
    val ref = rows(operators.Relational.valuePctlWindow(spark, sf))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("q_value_pctl: no Window operator (no single-task stratum sort)") {
    val p = planOf(operators.Relational.valuePctl(spark, sf))
    assert(!p.contains("Window"), s"stratum window reintroduced:\n$p")
  }

  test("q_value_pctl: small-n corpus (coinciding/boundary ranks) still matches") {
    // at sf0.001 per-type n is small enough that ceil(.95n)/ceil(.99n)
    // can coincide or hit the max rank — the rank→labels fan-out and
    // partition-boundary rank accounting must still reproduce the
    // window form exactly
    val fast = rows(operators.Relational.valuePctl(spark, SparkSpecBase.sf001))
    val ref = rows(operators.Relational.valuePctlWindow(spark, SparkSpecBase.sf001))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("q_pack_chunks: small corpus matches too") {
    val fast = rows(operators.TextAnalysis.qPackChunks(spark, SparkSpecBase.sf001))
    val ref = rows(operators.TextAnalysis.qPackChunksWindow(spark, SparkSpecBase.sf001))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** r18 optimization pins for the two window→aggregate collapses.
  *
  * q_window: `rn <= 5` admits only each supplier's FIRST five rows
  * (by the tie-free (shipdate, orderkey, linenumber) key), so the
  * rank+running-sum window collapses to the bounded FirstKAgg partial
  * aggregate — no full per-task sort of every scan partition (which
  * the WindowGroupLimit form still pays) and a ≤k-rows-per-(group,
  * partition) exchange.
  *
  * q_pipeline_select: keeper groups are identical-text groups and
  * identical text scores identically, so min-over-window + keeper
  * filter collapses to groupBy(h).agg(min …) with the lang/quality
  * filters evaluated on the aggregated verdicts. The shape pins below
  * also guard the two traps found while landing it: the filters must
  * stay ABOVE the aggregate (below it, PushPredicateThroughNonJoin
  * inlines the whole verdict chain into the scan filter — duplicate
  * evaluation), and pred_lang must cross the aggregate as a
  * fixed-width code (a min(string) buffer demotes the aggregate to
  * SortAggregate).
  */
class WindowCollapseSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  private val sf = SparkSpecBase.sf01

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q_window: FirstKAgg form matches the window form exactly") {
    val fast = rows(operators.Relational.windowFuncs(spark, sf))
    val ref = rows(operators.Relational.windowFuncsWindow(spark, sf))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("q_window: small corpus (suppliers with < 5 rows) still matches") {
    val fast = rows(operators.Relational.windowFuncs(spark, SparkSpecBase.sf001))
    val ref = rows(operators.Relational.windowFuncsWindow(spark, SparkSpecBase.sf001))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("q_window: no Window operator, no pre-exchange sort") {
    val p = planOf(operators.Relational.windowFuncs(spark, sf))
    assert(!p.contains("Window"), s"rank window reintroduced:\n$p")
    // the whole point: the map side must not sort its scan partition —
    // the only Sort allowed is the presentation orderBy after the
    // aggregate (which consumes k rows per supplier, not the corpus)
    val firstSort = p.indexOf("+- Sort")
    val agg = p.indexOf("ObjectHashAggregate")
    assert(agg >= 0, s"bounded aggregate missing:\n$p")
    assert(firstSort == -1 || firstSort < agg,
      s"sort below the aggregate (map-side partition sort is back):\n$p")
  }

  test("q_pipeline_select: aggregate form matches the window form exactly") {
    val fast = rows(operators.TextAnalysis.qPipelineSelect(spark, sf))
    val ref = rows(operators.TextAnalysis.qPipelineSelectWindow(spark, sf))
    assert(fast.nonEmpty)
    assert(fast == ref)
  }

  test("q_pipeline_select: HashAggregate keeper, verdicts evaluated once") {
    val p = planOf(operators.TextAnalysis.qPipelineSelect(spark, sf))
    assert(!p.contains("Window"), s"keeper window reintroduced:\n$p")
    assert(p.contains("HashAggregate"), s"keeper aggregate missing:\n$p")
    assert(!p.contains("SortAggregate"),
      s"string buffer demoted the keeper aggregate to SortAggregate:\n$p")
    // the verdict chain must not be inlined into a scan-level Filter
    // (the PushPredicateThroughNonJoin duplicate-evaluation trap):
    // the only filter below the projections is the cheap empty-doc
    // predicate, which mentions no language stopword list
    val scanFilter = p.linesIterator.filter(_.startsWith("Condition")).toSeq
    assert(scanFilter.forall(c => !c.contains("least(struct")),
      s"verdict chain inlined into a Filter (duplicate evaluation):\n$p")
  }
}

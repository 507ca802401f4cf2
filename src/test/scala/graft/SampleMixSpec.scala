package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Temperature-mixing pins (`q_sample_temperature`) — value-level
  * correctness is the DuckDB oracle's hash gate; here we pin the
  * published schedule's shape: α < 1 pushes rates toward uniform
  * (smallest source gets the HIGHEST sampling rate), weights are a
  * distribution, the realized character mass lands near the budget
  * fraction, and hash-rate selection is deterministic. */
class SampleMixSpec extends AnyFunSuite {

  private lazy val spark = SparkSpecBase.spark
  private val dir = SparkSpecBase.sf001

  private lazy val out = operators.TextAnalysis.qSampleTemperature(spark, dir)
    .collect()

  test("weights form a distribution and rates invert source size (alpha < 1)") {
    import spark.implicits._
    val bySource = out.groupBy(_.getString(1)).map { case (src, rows) =>
      (src, rows.head.getDouble(2), rows.head.getDouble(3), rows.length)
    }.toSeq.sortBy(_._4) // ascending by doc count
    assert(bySource.size >= 2, "need >= 2 sources for the shape pin")
    val wSum = bySource.map(_._2).sum
    assert(math.abs(wSum - 1.0) < 1e-2, s"weights sum to $wSum")
    bySource.foreach { case (src, w, rate, _) =>
      assert(w > 0 && rate > 0 && rate <= 1.0, s"$src: w=$w rate=$rate")
    }
    // chars per source drive the rate; recompute to order by size
    val sizes = Tables.documents(spark, dir)
      .groupBy($"source").agg(sum($"n_chars").as("cs"))
      .as[(String, Long)].collect().toMap
    val ordered = bySource.sortBy { case (src, _, _, _) => sizes(src) }
    assert(ordered.head._3 >= ordered.last._3,
      s"smallest source rate ${ordered.head._3} < largest's ${ordered.last._3}")
  }

  test("realized character mass lands near the budget fraction") {
    import spark.implicits._
    val chars = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    val selected = out.filter(_.getInt(4) == 1).map(r => chars(r.getLong(0))).sum
    val total = chars.values.sum
    val frac = selected.toDouble / total
    // hash-rate sampling is binomial per source; at 500 docs the
    // realized mass should still land in a generous band around 0.5
    assert(frac > 0.3 && frac < 0.7, s"selected mass fraction $frac")
  }

  test("deterministic across runs") {
    val again = operators.TextAnalysis.qSampleTemperature(spark, dir).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }
}

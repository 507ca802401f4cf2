package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SemDeDup (`q_dedup_semantic`) structural pins — the value-level
  * correctness is the DuckDB oracle's hash gate; here we pin the
  * published algorithm's invariants: groups are genuine (≥2 members),
  * exactly one keeper per group, the keeper is the member FARTHEST
  * from its cluster centroid (lowest cosine — Abbas et al. 2023's
  * diversity-preserving rule), and the operator is deterministic. */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSpecBase.spark
  private val dir = SparkSpecBase.sf001

  private lazy val out = operators.Dedup.qDedupSemantic(spark, dir).collect()

  test("every duplicate group has >= 2 members and exactly one keeper") {
    val byGroup = out.groupBy(_.getLong(1))
    assert(byGroup.nonEmpty, "no duplicate groups found at sf0.001")
    byGroup.foreach { case (gid, rows) =>
      assert(rows.length >= 2, s"group $gid has ${rows.length} member(s)")
      assert(rows.map(_.getLong(2)).distinct.sameElements(Array(rows.length.toLong)),
        s"group $gid group_n inconsistent")
      assert(rows.count(_.getInt(4) == 1) == 1, s"group $gid keeper count != 1")
    }
  }

  test("the keeper is the lowest-centroid-cosine member (tie -> lower id)") {
    out.groupBy(_.getLong(1)).foreach { case (gid, rows) =>
      val keeper = rows.find(_.getInt(4) == 1).get
      val best = rows.minBy(r => (r.getDouble(3), r.getLong(0)))
      assert(keeper.getLong(0) == best.getLong(0),
        s"group $gid kept ${keeper.getLong(0)}, rule says ${best.getLong(0)}")
    }
  }

  test("group ids are the component-min member id and members belong to one group") {
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "a vec_id appears in two groups")
    out.groupBy(_.getLong(1)).foreach { case (gid, rows) =>
      assert(rows.map(_.getLong(0)).min == gid,
        s"group $gid min member is ${rows.map(_.getLong(0)).min}")
    }
  }

  test("deterministic across runs and groups thin the corpus") {
    val again = operators.Dedup.qDedupSemantic(spark, dir).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
    import spark.implicits._
    val n = Tables.embeddings(spark, dir).count()
    val dropped = out.length - out.count(_.getInt(4) == 1)
    assert(dropped > 0 && dropped < n,
      s"semantic dedup dropped $dropped of $n — degenerate")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.VamanaIndex

/** Overlapped sharded build (merged-build DiskANN: every non-seed
  * point in its 2 nearest cells). What the 2× storage must buy, and
  * what the id-distinct merge must preserve:
  *  - strictly-accounted replication: row count = 2n − numShards,
  *    every non-seed id in exactly 2 shards, seeds in exactly 1;
  *  - the routing table is IDENTICAL to the plain build's (seeds stay
  *    primary-only, lowest-id rule);
  *  - probed recall at equal nprobe ≥ the plain index's — boundary
  *    replication can only add reachable true neighbors;
  *  - no duplicate (q_id, neighbor_id) pairs survive the merge, and
  *    ranks stay dense 1..k.
  */
class OverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("replication accounting and routing parity with the plain build") {
    val dir = SparkSpecBase.sf001
    val idx = VamanaIndex.cachedOverlapIndex(spark, dir)
    val n = Tables.embeddings(spark, dir).count()
    assert(idx.count() == 2 * n - VamanaIndex.qShards)
    val perId = idx.groupBy($"vec_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"shard").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(perId.filter(_._1 < VamanaIndex.qShards).values.forall(_ == 1L),
      "seed vectors must stay primary-only")
    assert(perId.filter(_._1 >= VamanaIndex.qShards).values.forall(_ == 2L),
      "every non-seed vector must sit in exactly 2 shards")
    val plain = VamanaIndex.cachedRouting(spark, dir)
    val over = VamanaIndex.cachedOverlapRouting(spark, dir)
    assert(plain.length == over.length)
    plain.zip(over).foreach { case ((s1, v1), (s2, v2)) =>
      assert(s1 == s2 && v1.sameElements(v2), s"routing drifted at shard $s1")
    }
  }

  test("probed recall at nprobe=4 is >= the plain index's, results dedup'd") {
    val dir = SparkSpecBase.sf001
    val plainRecall = VamanaIndex.probedRecall(spark, dir)
    val overRecall = VamanaIndex.probedRecallOverlap(spark, dir)
    assert(overRecall >= plainRecall - 1e-9,
      s"overlap recall $overRecall < plain $plainRecall")
    val res = VamanaIndex.qOverlapServe(spark, dir)
    val rows = res.select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)].collect()
    val dup = rows.groupBy(r => (r._1, r._3)).values.filter(_.length > 1)
    assert(dup.isEmpty, s"duplicate neighbors in merged result: ${dup.take(3)}")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length), s"ranks not dense for q=$q")
    }
  }
}

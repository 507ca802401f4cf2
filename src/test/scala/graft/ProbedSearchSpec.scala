package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{VamanaIndex, VamanaParams}

/** Routed (nprobe) search quality: recall must rise monotonically with
  * probed shards and reach 1.0 when all shards are probed (routing
  * must lose nothing vs the search-everything path). */
class ProbedSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 32, buildBeamWidth = 64,
    passes = 1, metric = "cosine")

  test("probed recall grows with nprobe and is total at nprobe=all") {
    val dir = SparkSpecBase.sf01
    val idx = VamanaIndex.cachedIndex(spark, dir)
    val qs = Tables.embeddings(spark, dir).filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val exact = operators.VectorQueries.qKnnExact(spark, dir)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recallAt(np: Int): Double = {
      val approx = VamanaIndex.searchProbed(idx, qs, 10, 64, params, np,
          excludeSelf = true)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, e) => (e & approx.getOrElse(q, Set.empty)).size / 10.0 }
        .sum / exact.size
    }

    val r1 = recallAt(1); val r4 = recallAt(4); val r8 = recallAt(8)
    assert(r1 <= r4 + 1e-9 && r4 <= r8 + 1e-9, s"$r1 $r4 $r8")
    assert(r4 >= 0.7, s"nprobe=4 recall $r4")
    assert(r8 == 1.0, s"nprobe=all recall $r8")
  }

  test("routing table persists in metadata.json and serves identically") {
    val dir = SparkSpecBase.sf001
    val idx = VamanaIndex.cachedIndex(spark, dir)
    val computed = VamanaIndex.routingTable(idx)
    val path = s"/tmp/graft_routing_spec_${spark.sparkContext.applicationId}"
    VamanaIndex.save(idx, params, path)
    val loaded = VamanaIndex.loadRouting(spark, path)
    assert(loaded.length == computed.length)
    computed.zip(loaded).foreach { case ((s1, v1), (s2, v2)) =>
      assert(s1 == s2 && v1.sameElements(v2), s"shard $s1 seed drifted in round-trip")
    }
    val qs = Tables.embeddings(spark, dir).filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val served = VamanaIndex.searchProbed(idx, qs, 10, 64, params, 4,
      excludeSelf = true, routing = Some(loaded)).collect()
    val recomputed = VamanaIndex.searchProbed(idx, qs, 10, 64, params, 4,
      excludeSelf = true).collect()
    assert(served.sameElements(recomputed))
  }
}

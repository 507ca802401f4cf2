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

  test("threshold recall >= id recall, both 1.0 for the full search (reference dual evaluation)") {
    // the reference reports id recall AND tie-tolerant threshold
    // recall side by side (diskann_skewed.rs:182-189); the threshold
    // flavor can only be more generous, and the exact-vs-itself case
    // must saturate both
    val dir = SparkSpecBase.sf001
    val row = VamanaIndex.qVamanaRecall(spark, dir).head()
    val idRecall = row.getDouble(0)
    val thr = row.getDouble(row.fieldIndex("threshold_recall"))
    assert(thr >= idRecall - 1e-9, s"threshold $thr < id $idRecall")
    assert(idRecall == 1.0 && thr == 1.0, s"full-search recalls $idRecall / $thr")
    val exact = graft.operators.VectorQueries.qKnnExact(spark, dir)
    val self = VamanaIndex.thresholdRecallDf(exact, exact).head().getDouble(0)
    assert(self == 1.0, s"exact-vs-exact threshold recall $self")
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

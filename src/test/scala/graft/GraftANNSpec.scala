package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.VamanaParams

class GraftANNSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "cosine")
  private lazy val path = {
    val p = "/tmp/graft_ann_spec_idx"
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    GraftANN.buildIndex(vecs, params, numShards = 2, p)
    p
  }

  test("build → open → metadata round-trips") {
    val h = GraftANN.openIndex(spark, path, params)
    assert(h.numVectors == Tables.embeddings(spark, SparkSpecBase.sf001).count())
    assert(h.dim == 64)
    assert(h.metadataJson.contains("graft-vamana-v1"))
  }

  test("openIndex with a different metric warns and serves it (open_index_with contract)") {
    // the reference warns and serves with the caller's distance
    // (lib.rs:476-482); only structural mismatches hard-error. The
    // l2-override handle must search with L2 semantics over the
    // cosine-built graph: self-match still holds (d(x,x)=0 in both).
    val h = GraftANN.openIndex(spark, path, params.copy(metric = "l2"))
    assert(h.params.metric == "l2")
    val q = h.getVector(5L)
    val nn = h.searchVector(q, k = 3, beamWidth = 32)
    assert(nn.head._1 == 5L && nn.head._2 < 1e-9)
    // a non-index directory still hard-errors
    intercept[Exception] {
      GraftANN.openIndex(spark, "/tmp/definitely_not_an_index", params)
    }
  }

  test("searchVector returns its own nearest neighbor first") {
    val h = GraftANN.openIndex(spark, path, params)
    val q = h.getVector(5L)
    val nn = h.searchVector(q, k = 3, beamWidth = 32)
    assert(nn.head._1 == 5L, nn.toSeq.toString)
    assert(nn.head._2 < 1e-9)
    assert(nn.map(_._2).sameElements(nn.map(_._2).sorted))
  }

  test("searchVectorIds returns the ids of searchVector (reference ids-only search)") {
    val h = GraftANN.openIndex(spark, path, params)
    val q = h.getVector(9L)
    assert(h.searchVectorIds(q, k = 5, beamWidth = 32)
      .sameElements(h.searchVector(q, k = 5, beamWidth = 32).map(_._1)))
  }

  test("searchFiltered through an opened index returns only target-label vectors") {
    val h = GraftANN.openIndex(spark, path, params)
    val labels = Tables.embeddings(spark, SparkSpecBase.sf001)
      .select($"vec_id", $"label")
    val qs = Tables.embeddings(spark, SparkSpecBase.sf001)
      .filter($"vec_id" % 200 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val res = h.searchFiltered(qs, k = 5, beamWidth = 128, labels, target = 2)
      .select($"neighbor_id").as[Long].collect()
    assert(res.nonEmpty)
    val labelOf = labels.as[(Long, Int)].collect().toMap
    res.foreach(nid => assert(labelOf(nid) == 2, s"vector $nid has label ${labelOf(nid)}"))
  }

  test("buildIndexDefault builds with VamanaParams() defaults") {
    val p = "/tmp/graft_ann_spec_default_idx"
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001).limit(100)
    val h = GraftANN.buildIndexDefault(vecs, numShards = 1, p)
    assert(h.params == index.VamanaParams())
    assert(GraftANN.openIndex(spark, p).params == index.VamanaParams())
  }

  test("batch search matches single-vector search") {
    val h = GraftANN.openIndex(spark, path, params)
    val q = h.getVector(7L)
    val batch = h.search(Seq((7L, q)).toDF("q_id", "qv"), k = 5, beamWidth = 32)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    val single = h.searchVector(q, k = 5, beamWidth = 32).map(_._1)
    assert(batch.sameElements(single))
  }

  test("openIndex with no params infers them from metadata (open_index_default_metric)") {
    val inferred = GraftANN.openIndex(spark, path)
    // every build knob round-trips through metadata.json
    assert(inferred.params == params)
    // and serving through the inferred handle is identical
    val explicit = GraftANN.openIndex(spark, path, params)
    val q = explicit.getVector(3L)
    val a = inferred.searchVector(q, k = 5, beamWidth = 32)
    val b = explicit.searchVector(q, k = 5, beamWidth = 32)
    assert(a.sameElements(b))
  }

  test("probed search serves from the persisted routing table") {
    val h = GraftANN.openIndex(spark, path, params)
    // routing read back from metadata.json covers every shard
    assert(h.routing.map(_._1).toSeq == Seq(0, 1))
    val q = h.getVector(11L)
    val probedAll = h.searchProbed(Seq((11L, q)).toDF("q_id", "qv"),
        k = 5, beamWidth = 32, nprobe = 2)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    val full = h.search(Seq((11L, q)).toDF("q_id", "qv"), k = 5, beamWidth = 32)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    // probing all shards must equal the unrouted search
    assert(probedAll.sameElements(full))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{SingleFileIndex, VamanaIndex, VamanaParams}

/** Byte-level single-file interop (reference lib.rs file layout): a
  * compacted (single-shard → single connected graph) index exported
  * to one file must serve identical results when loaded back into the
  * local mmap-style kernel. */
class SingleFileIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "cosine")

  test("export → importLocal round-trips vectors, adjacency, ids, and search") {
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    val idx = VamanaIndex.build(vecs, params, numShards = 1)
    val path = "/tmp/graft_single.idx"
    SingleFileIndex.export(idx, params, path)

    val (g, ids, p2) = SingleFileIndex.importLocal(path)
    assert(g.n == vecs.count())
    assert(g.dim == 64)
    assert(p2.metric == "cosine" && p2.maxDegree == 16)
    assert(ids.length == g.n && ids.sameElements(ids.sorted))

    // search parity: local kernel vs the distributed search on the
    // same index, for a handful of held-in queries
    val queries = vecs.filter($"vec_id" % 100 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val distributed = VamanaIndex.search(idx, queries, 5, 32, params)
      .orderBy($"q_id", $"rank")
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.foreach { case (qid, qv) =>
      val local = g.search(qv, 5, 32).map { case (pos, _) => ids(pos) }.toSeq
      assert(local == distributed(qid), s"query $qid: $local vs ${distributed(qid)}")
    }

    // adjacency degrees bounded as written
    assert(g.graph.forall(_.length <= 16))
  }
}

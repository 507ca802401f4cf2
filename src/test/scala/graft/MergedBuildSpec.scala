package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{SingleFileIndex, VamanaIndex, VamanaParams}

/** Parallel merged build ([[VamanaIndex.buildMerged]]) — the
  * single-file tier's answer to the sf10 rehearsal collapse (one
  * monolithic graph build pinning one core for hours at 2M vectors).
  * The merged graph must keep the single-graph SHAPE (one row per
  * vector, one shard, bounded degree) and the single-build QUALITY
  * (recall floor vs brute force after export), while the degenerate
  * numShards=1 path stays byte-identical to the monolithic kernel. */
class MergedBuildSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "cosine")

  test("merged build keeps single-graph shape: one row per vector, shard 0, bounded union degree") {
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    val n = vecs.count()
    val merged = VamanaIndex.buildMerged(vecs, params, numShards = 4).collect()
    assert(merged.length == n, s"${merged.length} rows for $n vectors — replicas must merge")
    assert(merged.map(_.vec_id).distinct.length == n)
    assert(merged.forall(_.shard == 0), "merged index is one logical shard")
    merged.foreach { r =>
      assert(!r.neighbors.contains(r.vec_id), s"self-edge at ${r.vec_id}")
      assert(r.neighbors.distinct.length == r.neighbors.length, s"dup edges at ${r.vec_id}")
      // union of ≤2 per-shard lists (overlap-2): ≤ 2·maxDegree
      assert(r.neighbors.length <= 2 * params.maxDegree,
        s"degree ${r.neighbors.length} exceeds 2·maxDegree at ${r.vec_id}")
    }
  }

  test("numShards=1 degenerates to the monolithic kernel build exactly") {
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    val mono = VamanaIndex.build(vecs, params, numShards = 1).collect()
      .sortBy(_.vec_id)
    val merged = VamanaIndex.buildMerged(vecs, params, numShards = 1).collect()
      .sortBy(_.vec_id)
    assert(mono.length == merged.length)
    mono.zip(merged).foreach { case (a, b) =>
      assert(a.vec_id == b.vec_id && a.neighbors.sameElements(b.neighbors))
    }
  }

  test("merged build exports to a single file that holds the recall floor") {
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    val idx = VamanaIndex.buildMerged(vecs, params, numShards = 4)
    val path = "/tmp/graft_merged_spec.idx"
    SingleFileIndex.export(idx, params, path)
    val (g, ids, _) = SingleFileIndex.importLocal(path)

    val all = vecs.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      1.0 - dot / (math.max(math.sqrt(na), java.lang.Double.MIN_NORMAL) *
        math.max(math.sqrt(nb), java.lang.Double.MIN_NORMAL))
    }
    val queries = all.filter(_._1 % 100 == 0)
    var recallSum = 0.0
    queries.foreach { case (_, qv) =>
      val got = g.search(qv, 10, 64).map { case (pos, _) => ids(pos) }.toSet
      val truth = all.map { case (nid, v) => (nid, cosDist(qv, v)) }
        .sortBy { case (nid, d) => (d, nid) }.take(10).map(_._1).toSet
      recallSum += got.intersect(truth).size / 10.0
    }
    val recall = recallSum / queries.length
    assert(recall >= 0.9, s"merged-build recall@10 $recall below 0.9 floor")
  }

  test("mergedShards keeps build tasks bounded and small corpora monolithic") {
    assert(VamanaIndex.mergedShards(1000L) == 1)
    assert(VamanaIndex.mergedShards(VamanaIndex.MergedShardRows / 2) == 1)
    assert(VamanaIndex.mergedShards(VamanaIndex.MergedShardRows / 2 + 1) == 2)
    assert(VamanaIndex.mergedShards(2000000L) == 80)
    assert(VamanaIndex.mergedShards(Long.MaxValue / 4) == 512, "shard count is capped")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexRow, StreamingIndex, VamanaIndex, VamanaParams}

/** FreshDiskANN StreamingMerge ([[StreamingIndex.consolidate]]):
  * deletes AND inserts applied in ONE scan of the graph. Pins
  * (a) the degenerate-form row-identities — empty log ≡ insertMerge,
  * empty batch ≡ merge — and the single-shard three-way identity
  * consolidate ≡ merge-then-insertMerge; (b) the combined lifecycle:
  * tombstone log retires with the swap, deleted ids leave the graph
  * physically, inserted ids link and serve; (c) re-insertion of a
  * TOMBSTONED id (legal here, a collision for insertMerge alone) and
  * loud rejection of a LIVE id; (d) the empty-shard path — a shard
  * the delete phase empties still absorbs inserts as a fresh chain. */
class ConsolidateSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "cosine")
  private val k = 10
  private val beam = 64

  private lazy val all: Array[(Long, Array[Float])] =
    Tables.embeddings(spark, SparkSpecBase.sf001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
  private lazy val base = all.filter(_._1 % 5 != 0)
  private lazy val batch = all.filter(_._1 % 5 == 0)

  private def freshIndex(p: String, shards: Int = 2): String = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    VamanaIndex.save(
      VamanaIndex.build(base.toSeq.toDF("vec_id", "embedding"), params, numShards = shards),
      params, p)
    p
  }

  private def rowsOf(p: String): Array[(Long, Int, Seq[Long], Seq[Float])] =
    VamanaIndex.load(spark, p).collect()
      .map(r => (r.vec_id, r.shard, r.neighbors.toSeq, r.embedding.toSeq))
      .sortBy(_._1)

  test("empty tombstone log: consolidate is row-identical to insertMerge") {
    val pA = freshIndex("/tmp/graft_consol_eqins_a")
    val pB = freshIndex("/tmp/graft_consol_eqins_b")
    StreamingIndex.insertMerge(spark, pA, batch.toSeq.toDF("vec_id", "embedding"), params)
    StreamingIndex.consolidate(spark, pB, batch.toSeq.toDF("vec_id", "embedding"), params)
    assert(rowsOf(pA).sameElements(rowsOf(pB)),
      "consolidate with no tombstones must equal insertMerge row-for-row")
  }

  test("empty batch: consolidate is row-identical to merge and retires the log") {
    val pA = freshIndex("/tmp/graft_consol_eqmrg_a")
    val pB = freshIndex("/tmp/graft_consol_eqmrg_b")
    val dead = base.map(_._1).filter(_ % 7 == 1).take(30).toSeq
    StreamingIndex.delete(spark, pA, dead)
    StreamingIndex.delete(spark, pB, dead)
    StreamingIndex.merge(spark, pA, params)
    StreamingIndex.consolidate(spark, pB,
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), params)
    assert(rowsOf(pA).sameElements(rowsOf(pB)),
      "consolidate with an empty batch must equal merge row-for-row")
    assert(StreamingIndex.tombstones(spark, pB).isEmpty,
      "the tombstone log must retire with the consolidate swap")
  }

  test("single shard: consolidate equals merge-then-insertMerge row-for-row") {
    // one shard makes routing trivially identical across the two
    // compositions; the only remaining difference is the intermediate
    // save/load, which must be lossless
    val pA = freshIndex("/tmp/graft_consol_2step", shards = 1)
    val pB = freshIndex("/tmp/graft_consol_1step", shards = 1)
    val dead = base.map(_._1).filter(_ % 9 == 2).take(25).toSeq
    StreamingIndex.delete(spark, pA, dead)
    StreamingIndex.delete(spark, pB, dead)
    StreamingIndex.merge(spark, pA, params)
    StreamingIndex.insertMerge(spark, pA, batch.toSeq.toDF("vec_id", "embedding"), params)
    StreamingIndex.consolidate(spark, pB, batch.toSeq.toDF("vec_id", "embedding"), params)
    assert(rowsOf(pA).sameElements(rowsOf(pB)),
      "one-pass consolidate diverged from the two-pass composition on one shard")
  }

  test("combined pass: log retires, deletes leave physically, inserts serve; re-insertion rules") {
    val p = freshIndex("/tmp/graft_consol_life")
    val dead = base.map(_._1).filter(_ % 10 == 1).take(20)
    StreamingIndex.delete(spark, p, dead.toSeq)
    // re-insert one tombstoned id under a NEW vector (the lifecycle
    // move only the one-pass merge can express)
    val reVec = batch(0)._2.map(_ + 0.01f)
    val ins = batch ++ Array((dead(0), reVec))
    StreamingIndex.consolidate(spark, p,
      ins.toSeq.toDF("vec_id", "embedding"), params)
    assert(StreamingIndex.tombstones(spark, p).isEmpty, "log must retire")
    val after = VamanaIndex.load(spark, p).collect()
    val afterIds = after.map(_.vec_id).toSet
    dead.drop(1).foreach(id =>
      assert(!afterIds(id), s"tombstoned $id still in the graph after consolidate"))
    assert(afterIds(dead(0)), "re-inserted id must be back in the graph")
    val reRow = after.find(_.vec_id == dead(0)).get
    assert(reRow.embedding.sameElements(reVec),
      "re-inserted id must carry the NEW vector, not the deleted one")
    assert(after.forall(_.neighbors.forall(afterIds)), "ghost neighbor after consolidate")
    // inserted points serve from the swapped index (no tombstone path
    // needed — the log is gone)
    val qs = batch.take(5)
    val res = StreamingIndex.searchLive(spark, p, qs, k, beam, params)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    qs.foreach { case (id, _) =>
      assert(res.filter(_._1 == id).map(_._2).contains(id),
        s"inserted $id not served after consolidate") }
    // a LIVE id in the batch still fails loudly
    intercept[IllegalArgumentException] {
      StreamingIndex.consolidate(spark, p,
        batch.take(1).toSeq.toDF("vec_id", "embedding"), params)
    }
  }

  test("a shard emptied by the delete phase still absorbs inserts as a fresh chain") {
    val p = freshIndex("/tmp/graft_consol_empty", shards = 1)
    StreamingIndex.delete(spark, p, base.map(_._1).toSeq)
    StreamingIndex.consolidate(spark, p,
      batch.toSeq.toDF("vec_id", "embedding"), params)
    val after = VamanaIndex.load(spark, p).collect()
    assert(after.map(_.vec_id).sorted.sameElements(batch.map(_._1)),
      "graph must hold exactly the insert batch after a full-delete consolidate")
    val ids = after.map(_.vec_id).toSet
    assert(after.forall(_.neighbors.forall(ids)), "ghost neighbor in the fresh chain")
    // every non-entry point linked, and the chain is searchable
    assert(after.count(_.neighbors.isEmpty) <= 1, "more than the entry point left unlinked")
    val selfQ = batch.take(10)
    val self = VamanaIndex.search(VamanaIndex.load(spark, p), selfQ, 1, beam, params)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    selfQ.foreach { case (id, _) =>
      assert(self(id) == id, s"$id is not its own nearest neighbor in the fresh chain") }
  }
}

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
  *  - probed recall at equal nprobe clears an absolute floor above
  *    the plain operating point (per-query dominance over plain is
  *    empirical — replication changes each shard's build — so it is
  *    not pinned as an invariant);
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

  test("sparse non-0-based vec_ids: seeds stay primary-only, accounting holds") {
    // ids start far above numShards — the regression this pins: seed
    // identification by actual id membership, not `id < numShards`
    val rnd = new java.util.Random(7)
    val n = 120; val shards = 4
    val emb = (0 until n).map { i =>
      (100000L + i * 37L, Array.fill(8)(rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val assigned = VamanaIndex.shardAssignOverlapped(emb, shards, overlap = 2)
    assert(assigned.count() == 2L * n - shards)
    val perId = assigned.groupBy($"vec_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"shard").as("s"))
      .as[(Long, Long)].collect().toMap
    val seedIds = (0 until shards).map(i => 100000L + i * 37L).toSet
    assert(perId.filter(kv => seedIds(kv._1)).values.forall(_ == 1L),
      "seed vectors must stay primary-only under sparse ids")
    assert(perId.filter(kv => !seedIds(kv._1)).values.forall(_ == 2L))
    // each shard's lowest id must be one of the seeds (routing rule)
    val lows = assigned.groupBy($"shard")
      .agg(org.apache.spark.sql.functions.min($"vec_id").as("lo"))
      .as[(Int, Long)].collect()
    assert(lows.forall(l => seedIds(l._2)), s"non-seed lowest id: ${lows.mkString(",")}")
  }

  test("probed recall at nprobe=4 clears an absolute floor above plain's, results dedup'd") {
    val dir = SparkSpecBase.sf001
    // NOT pinned as >= plain's recall: replication changes each
    // shard's build (different candidate sets → different α-pruned
    // edges), so per-query dominance is empirical, not guaranteed.
    // Pin absolute floors instead, like the other recall specs: the
    // overlap tier exists to lift routed recall well above plain's
    // observed ~0.69, so require a margin over that operating point.
    val overRecall = VamanaIndex.probedRecallOverlap(spark, dir)
    assert(overRecall >= 0.8, s"overlap recall $overRecall below 0.8 floor")
    val res = VamanaIndex.qOverlapServe(spark, dir)
    val rows = res.select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)].collect()
    val dup = rows.groupBy(r => (r._1, r._3)).values.filter(_.length > 1)
    assert(dup.isEmpty, s"duplicate neighbors in merged result: ${dup.take(3)}")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length), s"ranks not dense for q=$q")
    }
  }

  test("headline operating point holds at bench scale: sf0.1 overlap recall@10 >= 0.9") {
    // this is the pair Bench stdout leads with (qps_overlap /
    // recall_overlap) — pin its recall floor at the SF the driver
    // actually benches, not just the small spec corpus. Build and
    // search are fully deterministic (seeded pivots, id-ordered
    // ties), so the measured 0.9075 reproduces exactly; 0.9 leaves
    // margin only for intentional parameter retunes.
    // release the bench-scale cached index before the next suite —
    // leaving it pinned would recreate in the test JVM the very
    // cross-family storage pressure the bench's family releases fix
    try {
      val r = VamanaIndex.probedRecallOverlap(spark, SparkSpecBase.sf1)
      assert(r >= 0.9, s"sf0.1 overlap recall@10 $r below the 0.9 headline floor")
    } finally VamanaIndex.releaseCaches()
  }

  test("scale rehearsal: overlap recall@10 floor holds at 10x bench SF (GRAFT_SF1_DIR)") {
    // the round-8 scale-rehearsal pin: same headline floor, 10× the
    // corpus (20k vectors, near-duplicate-heavy jittered replicas —
    // scripts/make_scale.py). Opt-in by env var because the corpus
    // lives outside the repo and takes minutes to build/search; the
    // rehearsal protocol in BASELINE.md sets it.
    val dir = sys.env.get("GRAFT_SF1_DIR")
    assume(dir.nonEmpty, "GRAFT_SF1_DIR not set — rehearsal corpus absent")
    try {
      val r = VamanaIndex.probedRecallOverlap(spark, dir.get)
      assert(r >= 0.9, s"sf1 overlap recall@10 $r below the 0.9 headline floor")
    } finally VamanaIndex.releaseCaches()
  }
}

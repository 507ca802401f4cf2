package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs.cosineDist
import graft.index.{VamanaIndex, VamanaParams}

/** ×1000 scale rehearsal (env-gated, like OverlapSpec's sf1 floor):
  * 2M vectors — the scale step the 128 Ki ObjectHashAggregate
  * headroom was raised FOR (its 40k-query set crosses the old 32 Ki
  * cap, which sf10's 4k does not). Corpus:
  * `python3 scripts/make_scale.py /root/testdata/sf0.1 /tmp/graft_vec2m
  * 1000 embeddings`; run with `GRAFT_VEC2M_DIR=/tmp/graft_vec2m
  * GRAFT_TEST_CPUS=32 sbt "testOnly graft.Vec2MSpec"`. */
class Vec2MSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  test("x1000 rehearsal: 2M-vector build + 40k-query routed serving on the hash path (GRAFT_VEC2M_DIR)") {
    val dirOpt = sys.env.get("GRAFT_VEC2M_DIR")
    assume(dirOpt.nonEmpty, "GRAFT_VEC2M_DIR not set — ×1000 rehearsal corpus absent")
    import spark.implicits._
    val emb = Tables.embeddings(spark, dirOpt.get)
    val n = emb.count()
    assert(n === 2000000L, s"expected the ×1000 corpus, got $n rows")

    val params = VamanaParams(maxDegree = 32, buildBeamWidth = 64, alpha = 1.2,
      passes = 1, extraSeeds = 1, seed = 42L, metric = "cosine")
    val t0 = System.nanoTime()
    val idx = VamanaIndex.build(emb, params, numShards = 32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var served: org.apache.spark.sql.DataFrame = null
    try {
      assert(idx.count() === n)
      val buildS = (System.nanoTime() - t0) / 1e9
      info(f"build: $buildS%.1f s for $n vectors / 32 shards")

      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      // the claim under test: this query set crosses the OLD 32 Ki
      // hash-agg cap, and the session's raised headroom covers it —
      // without that, the serving TopK silently sort-spills (the r9
      // 800 M-row single-task failure one scale step up)
      assert(queries.length > 32768,
        s"query set ${queries.length} does not cross the old cap — corpus too small to test the claim")
      val thr = spark.conf
        .get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold").toInt
      assert(thr > queries.length,
        s"hash-agg fallback threshold $thr is below the ${queries.length}-group serving TopK")

      val pivots = VamanaIndex.pivotTable(idx)
      val t1 = System.nanoTime()
      served = VamanaIndex.searchProbed(idx, queries, k = 10, beamWidth = 64,
        params, nprobe = 4, pivots = Some(pivots)).persist()
      val rows = served.count()
      val serveS = (System.nanoTime() - t1) / 1e9
      info(f"serve: $serveS%.1f s for ${queries.length} queries (${queries.length} TopK groups)")
      assert(rows === queries.length * 10L, s"expected full k=10 result sets, got $rows")

      // threshold recall against exact ground truth on a deterministic
      // 1/59 query subsample (exact over ALL 40k × 2M is the 8×10¹⁰
      // wall the sf10 notes describe — the subsample is 678 × 2M).
      // Threshold (distance) recall, not id recall: a ×1000 replica
      // corpus has ~1000-way near-ties per neighborhood, so id recall
      // measures tie ambiguity (BASELINE sf10 k=100 caveat).
      val sample = queries.sortBy(_._1).zipWithIndex
        .collect { case (q, i) if i % 59 == 0 => q }
      val sampleDf = sample.toSeq.toDF("q_id", "qv")
      val exact = operators.VectorQueries.topkExplode(
        emb.join(broadcast(sampleDf))
          .select($"q_id", $"vec_id".as("nid"),
            cosineDist($"qv", $"embedding").as("dist")), 10)
      val exactKth = exact.groupBy($"q_id").agg(max($"dist").as("kth"))
      val sampleIds = sample.map(_._1).toSet
      val hits = served.filter($"q_id".isInCollection(sampleIds))
        .join(exactKth, "q_id")
        .filter($"dist" <= $"kth" + 1e-4)
        .count()
      val recall = hits.toDouble / (sample.length * 10)
      info(f"threshold recall@10 on ${sample.length} sampled queries: $recall%.3f")
      assert(recall >= 0.6, f"threshold recall $recall%.3f below the 0.6 rehearsal floor")
    } finally {
      if (served != null) served.unpersist(blocking = false)
      idx.unpersist(blocking = false)
      VamanaIndex.releaseCaches()
    }
  }

  test("x1000 rehearsal: the HEADLINE overlap-2 tier builds and serves at 2M (GRAFT_VEC2M_DIR)") {
    // the operating point the bench line leads with (overlap-2,
    // nprobe=4) had recall datapoints at sf0.1/sf1 but had never been
    // BUILT at 2M — the plain-routing test above exercises only the
    // 1× storage tier. Same capped overlap-2 build and id-distinct
    // routed merge as qOverlapServe, 2× the rows of the plain build.
    val dirOpt = sys.env.get("GRAFT_VEC2M_DIR")
    assume(dirOpt.nonEmpty, "GRAFT_VEC2M_DIR not set — ×1000 rehearsal corpus absent")
    import spark.implicits._
    val emb = Tables.embeddings(spark, dirOpt.get)
    val n = emb.count()
    assert(n === 2000000L, s"expected the ×1000 corpus, got $n rows")

    val params = VamanaParams(maxDegree = 32, buildBeamWidth = 64, alpha = 1.2,
      passes = 1, extraSeeds = 1, seed = 42L, metric = "cosine")
    val shards = 32
    val t0 = System.nanoTime()
    val (built, split) = VamanaIndex.buildOverlappedCapped(
      emb, params, shards, overlap = 2)
    val idx = built.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var served: org.apache.spark.sql.DataFrame = null
    try {
      val rows = idx.count()
      val buildS = (System.nanoTime() - t0) / 1e9
      // overlap-2 accounting: every non-seed vector in exactly 2
      // sub-shards (seeds primary-only) — 2n minus the parent seeds
      assert(rows > 2 * n - shards * split.toLong - 1000 && rows <= 2 * n,
        s"overlap-2 accounting off: $rows rows for $n vectors (split=$split)")
      info(f"overlap-2 build: $buildS%.1f s for $n vectors -> $rows index rows (split=$split)")

      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      val pivots = VamanaIndex.pivotTablePrimary(idx, split = split)
      val t1 = System.nanoTime()
      served = VamanaIndex.searchProbed(idx, queries, k = 10, beamWidth = 64,
        params, nprobe = 4, pivots = Some(pivots), distinctMerge = true).persist()
      val outRows = served.count()
      val serveS = (System.nanoTime() - t1) / 1e9
      info(f"overlap-2 serve: $serveS%.1f s for ${queries.length} queries")
      assert(outRows === queries.length * 10L, s"expected full k=10 sets, got $outRows")

      // threshold recall on the same deterministic 1/59 subsample as
      // the plain test (same replica-corpus tie rationale)
      val sample = queries.sortBy(_._1).zipWithIndex
        .collect { case (q, i) if i % 59 == 0 => q }
      val sampleDf = sample.toSeq.toDF("q_id", "qv")
      val exact = operators.VectorQueries.topkExplode(
        emb.join(broadcast(sampleDf))
          .select($"q_id", $"vec_id".as("nid"),
            cosineDist($"qv", $"embedding").as("dist")), 10)
      val exactKth = exact.groupBy($"q_id").agg(max($"dist").as("kth"))
      val sampleIds = sample.map(_._1).toSet
      val hits = served.filter($"q_id".isInCollection(sampleIds))
        .join(exactKth, "q_id")
        .filter($"dist" <= $"kth" + 1e-4)
        .count()
      val recall = hits.toDouble / (sample.length * 10)
      info(f"overlap-2 threshold recall@10 on ${sample.length} sampled queries: $recall%.3f")
      // measured 0.733 vs the plain tier's 0.686 on the same corpus
      // and probe budget — the headline claim (boundary replication
      // buys recall at CONSTANT fan-out) holds at 2M. Absolute values
      // sit far below the sf0.1/sf1 operating points (0.94/0.982)
      // because nprobe=4 of 32 shards is a 12.5% fan-out where those
      // probe 50%; the floor pins the measured 2M point with margin.
      assert(recall >= 0.72, f"overlap-2 threshold recall $recall%.3f below the 0.72 floor")
    } finally {
      if (served != null) served.unpersist(blocking = false)
      idx.unpersist(blocking = false)
      VamanaIndex.releaseCaches()
    }
  }
}

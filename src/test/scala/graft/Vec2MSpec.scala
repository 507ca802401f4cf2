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

  test("x1000 rehearsal: the stitched filtered tier builds and serves at 2M (GRAFT_VEC2M_DIR)") {
    // the r13 per-label tier at the same scale step as the other two:
    // 10 labels x ~200k members -> per-label Voronoi cells of <=100k,
    // filtered serving probes ONLY the target label's cells (2 of 20
    // graphs — selectivity-proportional scan by construction)
    val dirOpt = sys.env.get("GRAFT_VEC2M_DIR")
    assume(dirOpt.nonEmpty, "GRAFT_VEC2M_DIR not set — ×1000 rehearsal corpus absent")
    import spark.implicits._
    import graft.index.StitchedIndex
    val emb = Tables.embeddings(spark, dirOpt.get)
    val n = emb.count()
    assert(n === 2000000L, s"expected the ×1000 corpus, got $n rows")
    val params = VamanaParams(maxDegree = 32, buildBeamWidth = 64, alpha = 1.2,
      passes = 1, extraSeeds = 1, seed = 42L, metric = "cosine")
    val Target = 3
    val t0 = System.nanoTime()
    val idx = StitchedIndex.build(
      emb.select($"vec_id", $"embedding"), emb.select($"vec_id", $"label"),
      params, targetShardRows = 50000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var served: org.apache.spark.sql.DataFrame = null
    try {
      val rows = idx.count()
      assert(rows === n, s"single-label corpus must index 1 row per member, got $rows")
      val buildS = (System.nanoTime() - t0) / 1e9
      info(f"stitched build: $buildS%.1f s for $n vectors across 10 label families")

      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      val t1 = System.nanoTime()
      served = StitchedIndex.search(idx, queries, k = 10, beamWidth = 128,
        params, target = Target).persist()
      val outRows = served.count()
      val serveS = (System.nanoTime() - t1) / 1e9
      info(f"stitched serve: $serveS%.1f s for ${queries.length} queries over label $Target only")
      assert(outRows === queries.length * 10L, s"expected full k=10 sets, got $outRows")

      // label purity on a sample join (full check is one narrow join)
      val labelViol = served.join(
        emb.select($"vec_id".as("neighbor_id"), $"label"), Seq("neighbor_id"))
        .filter($"label" =!= Target).count()
      assert(labelViol === 0L, s"$labelViol non-target-label results surfaced")

      // threshold recall vs the exact FILTERED truth (label members
      // only) on the same deterministic 1/59 subsample; same
      // replica-tie rationale as the other two rehearsal tests
      val sample = queries.sortBy(_._1).zipWithIndex
        .collect { case (q, i) if i % 59 == 0 => q }
      val sampleDf = sample.toSeq.toDF("q_id", "qv")
      val exact = operators.VectorQueries.topkExplode(
        emb.filter($"label" === Target).join(broadcast(sampleDf))
          .select($"q_id", $"vec_id".as("nid"),
            cosineDist($"qv", $"embedding").as("dist")), 10)
      val exactKth = exact.groupBy($"q_id").agg(max($"dist").as("kth"))
      val sampleIds = sample.map(_._1).toSet
      val hits = served.filter($"q_id".isInCollection(sampleIds))
        .join(exactKth, "q_id")
        .filter($"dist" <= $"kth" + 1e-4)
        .count()
      val recall = hits.toDouble / (sample.length * 10)
      info(f"stitched threshold recall@10 on ${sample.length} sampled queries: $recall%.3f")
      // own-label subset: queries that satisfy their own filter (the
      // "search within my category" serving case) — their truth is
      // their OWN replica pile, the same easy task the plain/overlap
      // rehearsal metrics measure, so this is the apples-to-apples
      // number against those tests' 0.686/0.733
      val ownIds = emb.filter($"label" === Target)
        .filter($"vec_id" % 50 === 0).select($"vec_id").as[Long].collect().toSet
      val ownSample = sample.filter(q => ownIds(q._1))
      if (ownSample.nonEmpty) {
        val ownHits = served
          .filter($"q_id".isInCollection(ownSample.map(_._1).toSet))
          .join(exactKth, "q_id")
          .filter($"dist" <= $"kth" + 1e-4).count()
        val ownRecall = ownHits.toDouble / (ownSample.length * 10)
        info(f"own-label subset (${ownSample.length} queries): $ownRecall%.3f")
        // measured 0.767 — the best of the three 2M tiers on the
        // own-pile task (plain 0.686, overlap-2 0.733), as full
        // label coverage should be; floor with margin
        assert(ownRecall >= 0.7,
          f"own-label threshold recall $ownRecall%.3f below the 0.7 floor")
      }
      // all-queries floor: STRICTER task than the plain/overlap
      // metrics — a non-target-label query's filtered truth is a
      // FOREIGN replica pile (the query's own copies aren't eligible),
      // so the metric is bounded by in-pile discrimination at ~1000-way
      // near-ties, not by coverage (every target cell is searched,
      // label purity is exact). Measured 0.481/0.494/0.541 at beam
      // 64·100k-cells / 64·50k-cells / 128·50k-cells.
      assert(recall >= 0.5, f"stitched threshold recall $recall%.3f below the 0.5 floor")
    } finally {
      if (served != null) served.unpersist(blocking = false)
      idx.unpersist(blocking = false)
      StitchedIndex.release()
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

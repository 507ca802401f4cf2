package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{VamanaIndex, VamanaParams}

/** Skewed-corpus ANN behavior (reference examples/diskann_skewed.rs
  * pins recall on pathologically skewed clouds): a corpus that is one
  * dense cluster plus uniform noise is exactly where IVF-style
  * sharding degrades — kmeans cells crowd the dense region, shard
  * sizes spread apart, and routing must still find the right cells.
  * This spec pins (a) the observed shard-size spread so a sharding
  * regression is loud, and (b) probed recall@10 vs exact brute force
  * on both dense-cluster and noise queries.
  */
class SkewedCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val Dim = 16
  private val N = 3000
  private val DenseFrac = 0.8 // 80% of points in one tight ball

  /** splitmix64 — deterministic synthetic cloud, no RNG state. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def unit(seed: Long): Double =
    (mix(seed) >>> 11).toDouble / (1L << 53).toDouble // [0, 1)

  /** id < N·DenseFrac → tight cluster around a fixed center (spread
    * 0.05); rest → uniform noise in [-1, 1]^Dim. */
  private def point(id: Int): Array[Float] = {
    val dense = id < (N * DenseFrac).toInt
    Array.tabulate(Dim) { d =>
      val u = unit(id.toLong * 1013L + d)
      if (dense) (0.5 + (u - 0.5) * 0.05).toFloat
      else (u * 2.0 - 1.0).toFloat
    }
  }

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32,
    passes = 1, metric = "l2")
  private val NumShards = 8

  private lazy val corpus = (0 until N).map(i => (i.toLong, point(i)))
  private lazy val idx = {
    val df = spark.createDataFrame(corpus).toDF("vec_id", "embedding")
    VamanaIndex.build(df, params, NumShards).cache()
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  test("shard sizes spread under skew but every shard stays non-empty") {
    val sizes = idx.groupBy($"shard").count()
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(sizes.length == NumShards, s"lost shards: ${sizes.length}")
    assert(sizes.sum == N)
    assert(sizes.min > 0, "empty shard: routing would probe dead cells")
    // kmeans sharding under 80/20 skew: cells concentrate in the dense
    // ball, so the spread is real but bounded — no shard should hold a
    // majority of the corpus (that would mean sharding collapsed and
    // one task serves most probes). Observed at pinning time:
    // sizes 639/368/479/141/346/585/123/319 — a 5.2× min-to-max
    // spread, largest shard 21% of the corpus: the dense ball splits
    // across several cells rather than collapsing into one.
    assert(sizes.max.toDouble / N < 0.55,
      s"one shard holds ${sizes.max} of $N — sharding collapsed: ${sizes.mkString(",")}")
  }

  test("probed recall@10 holds for dense-cluster AND noise queries") {
    // queries: 15 from the dense ball, 15 from the noise region
    val qids = (0 until 15).map(_ * 100) ++ (0 until 15).map(2450 + _ * 30)
    val queries = qids.map(i => (i.toLong, point(i))).toArray

    def exactTop10(q: Array[Float], self: Long): Set[Long] =
      corpus.filter(_._1 != self)
        .map { case (id, v) => (l2(q, v), id) }
        .sortBy(identity).take(10).map(_._2).toSet

    def recallAt(np: Int): (Double, Double) = {
      val got = VamanaIndex.searchProbed(idx, queries, 10, 64, params, np,
          excludeSelf = true)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val (dq, nq) = queries.partition(_._1 < (N * DenseFrac).toInt)
      def avg(qs: Array[(Long, Array[Float])]) =
        qs.map { case (id, q) =>
          (exactTop10(q, id) & got.getOrElse(id, Set.empty)).size / 10.0
        }.sum / qs.length
      (avg(dq), avg(nq))
    }

    val (dense4, noise4) = recallAt(4)
    val (denseAll, noiseAll) = recallAt(NumShards)
    // probing every shard must recover near-exact recall in BOTH
    // regimes — beam search inside a shard is still approximate, so
    // the floor is high-but-not-1.0 for noise queries whose neighbors
    // are spread thin
    assert(denseAll >= 0.95, s"dense recall at nprobe=all: $denseAll")
    assert(noiseAll >= 0.85, s"noise recall at nprobe=all: $noiseAll")
    // nprobe=4 of 8: the dense ball spans several cells, so routed
    // probing must still find most true neighbors; noise queries route
    // to their own sparse cells
    assert(dense4 >= 0.7, s"dense recall at nprobe=4: $dense4")
    assert(noise4 >= 0.6, s"noise recall at nprobe=4: $noise4")
    // monotonic: probing more shards never hurts
    assert(denseAll >= dense4 - 1e-9 && noiseAll >= noise4 - 1e-9)
  }

  test("capped build bounds the largest shard regardless of skew; recall holds") {
    // centroid quality cannot bound the largest cell (k-means
    // minimizes variance, not balance — a Lloyd-trained assignment on
    // THIS cloud collapses 66% of the corpus into one cell), so the
    // guarantee comes from deterministic hash-splitting of oversized
    // cells: max shard ≤ capFactor·n/numShards, always
    val df = spark.createDataFrame(corpus).toDF("vec_id", "embedding")
    val capFactor = 1.5
    val capped = VamanaIndex.buildCapped(df, params, NumShards, capFactor).cache()
    val sizes = capped.groupBy($"shard").count()
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val cap = math.ceil(capFactor * N.toDouble / NumShards).toLong
    val seedMax = idx.groupBy($"shard").count().as[(Int, Long)].collect().map(_._2).max
    info(s"seed max shard $seedMax -> capped max ${sizes.max} (hard cap $cap, " +
      s"${sizes.length} shards: ${sizes.mkString("/")})")
    assert(sizes.sum == N)
    assert(sizes.max <= cap, s"cap violated: ${sizes.max} > $cap")

    // deterministic: two builds produce identical shard tags
    val again = VamanaIndex.buildCapped(df, params, NumShards, capFactor)
      .select($"vec_id", $"shard").as[(Long, Int)].collect().sortBy(_._1)
    val first = capped.select($"vec_id", $"shard").as[(Long, Int)].collect().sortBy(_._1)
    assert(again.sameElements(first))

    // full (all-shard) serving through the capped index keeps recall:
    // splitting a cell only partitions its graph, never drops vectors
    val qids = (0 until 10).map(_ * 150)
    val queries = qids.map(i => (i.toLong, point(i))).toArray
    val got = VamanaIndex.search(capped, queries, 10, 64, params,
        excludeSelf = true)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = queries.map { case (id, q) =>
      val truth = corpus.filter(_._1 != id)
        .map { case (nid, v) => (l2(q, v), nid) }
        .sortBy(identity).take(10).map(_._2).toSet
      (truth & got.getOrElse(id, Set.empty)).size / 10.0
    }.sum / queries.length
    assert(recall >= 0.9, s"capped-build recall@10 $recall")
    capped.unpersist()
  }

  test("capped OVERLAPPED build: cap holds, parents recover, no sibling pivot starvation") {
    // the headline overlap-2 tier under the same 80/20 skew that
    // motivates buildCapped (the sf10 rehearsal: Voronoi stragglers
    // serialized the merged build for 20+ min until capAssignment was
    // applied) — r9's scaladoc said "capped and overlap never
    // combine"; this pins the r10 combination end to end
    val df = spark.createDataFrame(corpus).toDF("vec_id", "embedding")
    val capFactor = 1.5
    val (capped0, split) =
      VamanaIndex.buildOverlappedCapped(df, params, NumShards, 2, capFactor)
    val capped = capped0.cache()
    val totalRows = 2L * N - NumShards // overlap-2, seeds primary-only
    assert(capped.count() == totalRows, "replication accounting broke under capping")
    val sizes = capped.groupBy($"shard").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val cap = math.ceil(capFactor * totalRows.toDouble / NumShards).toLong
    info(s"split=$split, ${sizes.length} sub-shards, " +
      s"max ${sizes.map(_._2).max} (hard cap $cap)")
    assert(split > 1,
      "the dense ball must actually trigger a split — otherwise this test pins nothing")
    assert(sizes.map(_._2).max <= cap,
      s"cap violated: ${sizes.map(_._2).max} > $cap")

    // replicas survive the re-tag: every non-seed id in exactly 2
    // sub-shards of DISTINCT parent cells, seeds in exactly 1
    val perId = capped.select($"vec_id", $"shard").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2 / split).toSeq).toMap
    assert(perId.filter(_._1 >= NumShards).forall { case (_, ps) =>
      ps.length == 2 && ps.distinct.length == 2
    }, "a non-seed vector lost a replica or both replicas folded into one parent")
    assert(perId.filter(_._1 < NumShards).forall(_._2.length == 1))

    // parent centroids recover EXACTLY: parentSeeds must surface the
    // original assignment centroids (the NumShards lowest-id rows)
    // from the per-sub-shard seed table
    val parents = VamanaIndex.parentSeeds(VamanaIndex.routingTableWithIds(capped), split)
    assert(parents.map(_._1).sameElements(0 until NumShards),
      s"parent ids drifted: ${parents.map(_._1).mkString(",")}")
    parents.foreach { case (p, v) =>
      assert(v.sameElements(point(p)), s"parent $p centroid is not seed row $p")
    }

    // the starvation regression this guards: a per-sub-shard argmin
    // test would crown ONE sibling per split parent (near-identical
    // seeds) and leave the rest with empty primary samples; the
    // parent-grouped test gives EVERY sibling its own primary sample.
    // (Fallback pivots are all-replica rows, and a replica's argmin is
    // its OTHER parent — so "all pivots argmin here" identifies a
    // genuinely primary sample.)
    val pivots = VamanaIndex.pivotTablePrimary(capped, split = split)
    assert(pivots.length == sizes.length, "an occupied sub-shard lost its pivots")
    val splitParents = sizes.map(_._1 / split).groupBy(identity)
      .filter(_._2.length > 1).keySet
    assert(splitParents.nonEmpty)
    splitParents.foreach { p =>
      val sibs = pivots.filter(_._1 / split == p)
      val primarySampled = sibs.count { case (_, pv) =>
        pv.nonEmpty && pv.forall(v => VamanaIndex.primaryShard(v, parents) == p)
      }
      assert(primarySampled == sibs.length,
        s"parent $p: only $primarySampled of ${sibs.length} siblings hold primary pivots")
    }

    // probed serving through the capped overlap tier keeps the
    // skewed-corpus floors of the plain probed test above (nprobe=4
    // now picks among MORE, smaller sub-shards — boundary replication
    // is what keeps the floor)
    val qids = (0 until 15).map(_ * 100) ++ (0 until 15).map(2450 + _ * 30)
    val queries = qids.map(i => (i.toLong, point(i))).toArray
    val got = VamanaIndex.searchProbed(capped, queries, 10, 64, params, nprobe = 4,
        excludeSelf = true, pivots = Some(pivots), distinctMerge = true)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(qs: Seq[(Long, Array[Float])]): Double =
      qs.map { case (id, q) =>
        val truth = corpus.filter(_._1 != id)
          .map { case (nid, v) => (l2(q, v), nid) }
          .sortBy(identity).take(10).map(_._2).toSet
        (truth & got.getOrElse(id, Set.empty)).size / 10.0
      }.sum / qs.length
    val (dq, nq) = queries.partition(_._1 < (N * DenseFrac).toInt)
    val (dense4, noise4) = (recallOf(dq.toSeq), recallOf(nq.toSeq))
    info(s"capped-overlap probed recall@10 nprobe=4: dense $dense4, noise $noise4")
    assert(dense4 >= 0.7, s"dense recall at nprobe=4: $dense4")
    assert(noise4 >= 0.6, s"noise recall at nprobe=4: $noise4")

    // deterministic: the re-tag is measured-histogram + FFD over
    // xxhash64 slices — two builds must tag identically
    val again = VamanaIndex.buildOverlappedCapped(df, params, NumShards, 2, capFactor)
      ._1.select($"vec_id", $"shard").as[(Long, Int)].collect().sorted
    val first = capped.select($"vec_id", $"shard").as[(Long, Int)].collect().sorted
    assert(again.sameElements(first))
    capped.unpersist()
  }

  test("semDeDupCapped: the O(cell²) pair scan stays task-bounded under 80/20 skew") {
    // SemDeDup's clustering stage exists to make web-scale dedup
    // sub-quadratic — but an uncapped Lloyd assignment on THIS cloud
    // funnels the dense ball into one cell, and the within-cell pair
    // scan is quadratic in that cell. The capped composition (trained
    // centroids → FFD re-tag → cell-local union-find) bounds every
    // task at capFactor·n/nCells pairs-side rows, which is the whole
    // point; this pins the bound, the split actually firing, the
    // keep-rule contract, and determinism.
    import graft.operators.{Dedup, KMeans}
    val df = spark.createDataFrame(corpus).toDF("vec_id", "embedding")
    val nCells = 8; val capFactor = 1.5
    // the capping pass itself, replayed for inspection (same calls
    // semDeDupCapped makes internally — all deterministic)
    val cents = KMeans.trainedCentroidsOf(df, nCells, 2)
    val assigned = KMeans.assign(df, cents)
      .select($"vec_id", $"embedding", $"cell".as("shard"))
    val uncappedMax = assigned.groupBy($"shard").count()
      .as[(Int, Long)].collect().map(_._2).max
    val (recapped, totalShards) =
      VamanaIndex.capAssignment(assigned, nCells, capFactor)
    val cap = math.ceil(capFactor * N.toDouble / nCells).toLong
    val cellSizes = recapped.groupBy($"shard").count()
      .as[(Int, Long)].collect().map(_._2)
    info(s"uncapped max cell $uncappedMax -> capped max ${cellSizes.max} " +
      s"(cap $cap, ${cellSizes.length} cells, maxSplit ${totalShards / nCells})")
    assert(uncappedMax > cap,
      "the dense ball must overflow a trained cell — otherwise this pins nothing")
    assert(cellSizes.max <= cap, s"cap violated: ${cellSizes.max} > $cap")
    assert(totalShards / nCells > 1, "no cell split — the skew never fired")

    val out = Dedup.semDeDupCapped(df, nCells, capFactor).cache()
    val rows = out.select($"vec_id", $"group_id", $"group_n", $"c_sim", $"keep")
      .as[(Long, Long, Long, Double, Int)].collect()
    // group contract: every group ≥2 members, group_n consistent,
    // exactly one keep and it is the (c_sim, vec_id)-min member
    val byGroup = rows.groupBy(_._2)
    byGroup.foreach { case (gid, ms) =>
      assert(ms.length >= 2, s"group $gid has ${ms.length} member")
      assert(ms.forall(_._3 == ms.length), s"group_n drift in $gid")
      assert(gid == ms.map(_._1).min, s"group id $gid is not the min member")
      val keeps = ms.filter(_._5 == 1)
      assert(keeps.length == 1, s"group $gid has ${keeps.length} keeps")
      val want = ms.minBy(m => (m._4, m._1))
      assert(keeps.head._1 == want._1,
        s"group $gid kept ${keeps.head._1}, want ${want._1} (lowest centroid cosine)")
    }
    // the dense ball IS one semantic-duplicate mass: near-identical
    // vectors (spread 0.05 around one center) sit at cosine ≈ 1 ≥ τ,
    // so the bulk of the ball must be flagged even though the scan
    // never crosses capped-cell boundaries
    val denseN = (N * DenseFrac).toInt
    val denseFlagged = rows.count(_._1 < denseN)
    info(s"dense-ball members flagged: $denseFlagged / $denseN in " +
      s"${byGroup.size} groups over ${rows.length} total rows")
    assert(denseFlagged >= (denseN * 0.95).toInt,
      s"only $denseFlagged of $denseN dense-ball members flagged")
    // deterministic end to end
    val again = Dedup.semDeDupCapped(df, nCells, capFactor)
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(again.sameElements(rows.sortBy(_._1)))
    out.unpersist()
  }

  test("semDeDupCapped scale rehearsal: sf1 corpus + 200k skew ball (GRAFT_SEMCAP_SCALE)") {
    assume(sys.env.contains("GRAFT_SEMCAP_SCALE"),
      "GRAFT_SEMCAP_SCALE not set — semDeDupCapped scale rehearsal skipped")
    import graft.operators.Dedup
    // shape 1: the 10x bench corpus (50k x dim-64 embeddings)
    val sf1 = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val emb = Tables.embeddings(spark, sf1).select($"vec_id", $"embedding")
    val n1 = emb.count()
    val t0 = System.nanoTime()
    val out1 = Dedup.semDeDupCapped(emb, nCells = 64, capFactor = 1.5)
    val rows1 = out1.count()
    val w1 = (System.nanoTime() - t0) / 1e9
    info(f"sf1 ($n1%d x 64): $w1%.1f s, $rows1 dup-group rows")
    assert(rows1 > 0)
    // shape 2: 200k x dim-16 80/20 skew ball — the adversarial-skew
    // regime; without the cap one cell would hold 160k vectors and
    // the pair scan would be 1.3e10 cosine pairs in ONE task
    val nBig = 200000
    val big = spark.range(nBig)
      .map(id => (id, SkewedCorpusSpec.bigPoint(id, 16, nBig)))
      .toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count()
    val t1 = System.nanoTime()
    val out2 = Dedup.semDeDupCapped(big, nCells = 64, capFactor = 1.5)
    val rows2 = out2.count()
    val w2 = (System.nanoTime() - t1) / 1e9
    info(f"skew ball ($nBig x 16, 80%% in one ball): $w2%.1f s, $rows2 dup-group rows")
    // the dense ball must be found as duplicate mass despite capping
    assert(rows2 >= (nBig * 0.8 * 0.9).toLong,
      s"only $rows2 of ~${(nBig * 0.8).toInt} dense-ball members flagged")
    big.unpersist(blocking = false)
  }
}

object SkewedCorpusSpec extends Serializable {
  /** The suite's 80/20 point generator, dimension/size-parametric —
    * executor-side for the scale rehearsal (the inner spec methods
    * capture the suite instance and must stay driver-only). */
  def bigPoint(id: Long, dim: Int, n: Int): Array[Float] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def unit(seed: Long): Double = (mix(seed) >>> 11).toDouble / (1L << 53).toDouble
    val dense = id < (n * 0.8).toLong
    Array.tabulate(dim) { d =>
      val u = unit(id * 1013L + d)
      if (dense) (0.5 + (u - 0.5) * 0.05).toFloat
      else (u * 2.0 - 1.0).toFloat
    }
  }
}

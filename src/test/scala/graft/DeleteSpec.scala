package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{StreamingIndex, VamanaIndex, VamanaParams}

/** Lazy-delete lifecycle (the FreshDiskANN pattern): tombstoned ids
  * vanish from results immediately while the graph keeps routing
  * through them, and compaction drops them physically and retires the
  * tombstone log. Pins the guarantees q_vamana_deleted relies on.
  */
class DeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val params = VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "cosine")
  private val k = 5
  private val beam = 64

  // fresh index per suite run: build → save → delete every 5th id
  private lazy val path = {
    val p = "/tmp/graft_delete_spec_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    VamanaIndex.save(VamanaIndex.build(vecs, params, numShards = 2), params, p)
    p
  }
  private lazy val all: Map[Long, Array[Float]] =
    Tables.embeddings(spark, SparkSpecBase.sf001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
  private lazy val tombs: Set[Long] = all.keySet.filter(_ % 5 == 0)

  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    1.0 - dot / math.sqrt(na * nb)
  }

  private def liveNearest(q: Array[Float], n: Int): Seq[Long] =
    all.view.filterKeys(id => !tombs(id)).toSeq
      .sortBy { case (_, v) => cosDist(q, v) }.take(n).map(_._1)

  test("with an empty tombstone log, searchLive is plain search") {
    path // force build before any delete lands
    val qs = Array((1L, all(1L)))
    val got = StreamingIndex.searchLive(spark, path, qs, k, beam, params)
      .select($"neighbor_id").as[Long].collect()
    assert(got.head == 1L)
  }

  test("deleted ids never appear in results; live queries still self-match") {
    path
    StreamingIndex.delete(spark, path, tombs.toSeq)
    val liveQ = Seq(1L, 7L, 13L).map(id => (id, all(id)))
    val res = StreamingIndex.searchLive(spark, path, liveQ.toArray, k, beam, params)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(res.nonEmpty)
    res.foreach { case (_, nid) => assert(!tombs(nid), s"tombstoned $nid served") }
    liveQ.foreach { case (id, _) =>
      assert(res.filter(_._1 == id).map(_._2).head == id,
        s"live $id no longer its own nearest neighbor") }
  }

  test("a tombstoned query vector resolves to its nearest LIVE vector") {
    path
    val qid = tombs.head
    val got = StreamingIndex.searchLive(spark, path, Array((qid, all(qid))), k, beam, params)
      .select($"neighbor_id").as[Long].collect()
    assert(!got.contains(qid))
    // lazy delete keeps the deleted node routable, so recall on the
    // live set holds: the served head must be among the true live top-3
    assert(liveNearest(all(qid), 3).contains(got.head),
      s"head ${got.head} not in live top-3 ${liveNearest(all(qid), 3)}")
  }

  test("1e5-entry tombstone log: kernel exclusion holds, broadcast and join paths agree") {
    path
    // a log far larger than the corpus (absent ids are harmless no-ops
    // in both paths): the broadcast side carries a sorted primitive
    // long array, the Df side joins a deleted flag — neither builds a
    // boxed driver Set, and they must serve identical rows
    val synthetic = (10_000_000L until 10_000_000L + 100_000L)
    val bigSet = tombs ++ synthetic
    assert(bigSet.size >= 100_000)
    val idx = VamanaIndex.load(spark, path)
    val qs = Seq(1L, 7L, 13L, tombs.head).map(id => (id, all(id))).toArray
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
      df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaBroadcast = rows(VamanaIndex.searchExcluding(
      idx, qs, k, beam, params, bigSet))
    val viaJoin = rows(VamanaIndex.searchExcludingDf(
      idx, bigSet.toSeq.toDF("vec_id"), qs, k, beam, params))
    assert(viaBroadcast == viaJoin,
      s"first diff: ${viaBroadcast.zip(viaJoin).find { case (a, b) => a != b }}")
    viaBroadcast.foreach { case (_, _, nid, _) =>
      assert(!bigSet(nid), s"tombstoned $nid served") }
    // live queries still self-match through the 1e5-entry exclusion
    Seq(1L, 7L, 13L).foreach { id =>
      assert(viaBroadcast.filter(_._1 == id).minBy(_._2)._3 == id) }
  }

  test("compact drops tombstoned rows physically and retires the log") {
    path
    StreamingIndex.delete(spark, path, tombs.toSeq) // idempotent re-log
    StreamingIndex.compact(spark, path, params, numShards = 2)
    assert(!new java.io.File(s"$path/tombstones").exists(), "log not retired")
    val served = VamanaIndex.load(spark, path)
      .select($"vec_id").as[Long].collect().toSet
    assert(served == all.keySet.diff(tombs))
    // and the compacted index serves without the filter path
    val got = StreamingIndex.searchLive(spark, path, Array((1L, all(1L))), k, beam, params)
      .select($"neighbor_id").as[Long].collect()
    assert(got.head == 1L)
  }

  test("compact with filesDir ends the lifecycle at the sharded-files tier, row-identical") {
    // ingest → delete → compact(filesDir) → serveSharded: the disk-
    // resident tier built by compaction must serve the SAME rows as
    // the in-memory tier over the just-compacted parquet
    path
    val fd = "/tmp/graft_delete_spec_files"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fd))
    StreamingIndex.compact(spark, path, params, numShards = 2, filesDir = Some(fd))
    assert(new java.io.File(s"$fd/manifest.json").exists(), "no manifest emitted")
    // tombstoned rows (dropped by the earlier compact test) must not
    // resurface in the files tier
    val fileIds = graft.index.SingleFileIndex.readManifest(spark, fd).flatMap {
      case (_, f, _) =>
        val (_, ids, _) = graft.index.SingleFileIndex.importLocal(s"$fd/$f")
        ids
    }.toSet
    assert(fileIds == all.keySet.diff(tombs), "files tier ids != compacted live set")
    val qs = Seq(1L, 7L, 13L, 101L).map(id => (id, all(id)))
    val qdf = qs.toDF("q_id", "qv")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
      df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val files = rows(graft.index.SingleFileIndex.serveSharded(qdf, fd, k, beam))
    val mem = rows(VamanaIndex.search(
      VamanaIndex.load(spark, path), qs.toArray, k, beam, params))
    assert(files == mem,
      s"first diff: ${files.zip(mem).find { case (a, b) => a != b }}")
  }

  test("compact with overlap=2 lands the stream on the headline tier: both tiers row-identical, recall >= plain") {
    // ingest → delete → compact(overlap=2, filesDir): the stream ends
    // on the SAME operating point as a batch overlap build — replicas
    // present, primary-only pivots persisted in both metadata.json and
    // the files manifest, parquet and files tiers row-identical under
    // distinctMerge, and routed recall at nprobe=1 at least the plain
    // compact's (the whole point of paying 2× storage)
    path
    val live = all.keySet.diff(tombs)
    val qs = Seq(1L, 7L, 13L, 101L).map(id => (id, all(id)))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
      df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    def recallOf(res: Seq[(Long, Int, Long, Double)]): Double = {
      val byQ = res.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
      qs.map { case (qid, qv) =>
        val exact = live.toSeq.sortBy(id => (cosDist(qv, all(id)), id)).take(k).toSet
        (exact & byQ.getOrElse(qid, Set.empty)).size.toDouble / k
      }.sum / qs.size
    }
    // plain nprobe=1 baseline over the already-compacted index
    val plainIdx = VamanaIndex.load(spark, path)
    val plainR = recallOf(rows(VamanaIndex.searchProbed(
      plainIdx, qs.toArray, k, beam, params, nprobe = 1)))
    val fd = "/tmp/graft_delete_spec_overlap_files"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fd))
    StreamingIndex.compact(spark, path, params, numShards = 2,
      filesDir = Some(fd), overlap = 2)
    val idx = VamanaIndex.load(spark, path)
    val nRows = idx.count()
    val nIds = idx.select($"vec_id").distinct().count()
    assert(nIds == live.size, "overlap compact changed the live set")
    assert(nRows > nIds, "overlap compact produced no replicas")
    // pivots persisted by save() are primary-only and match the files
    // manifest exactly — the two tiers must route identically
    val metaPivots = VamanaIndex.loadPivots(spark, path)
    val manPivots = graft.index.SingleFileIndex.readManifestPivots(spark, fd)
      .map { case (sh, _, pv) => (sh, pv) }
    assert(metaPivots.length == manPivots.length)
    metaPivots.zip(manPivots).foreach { case ((s1, p1), (s2, p2)) =>
      assert(s1 == s2 && p1.length == p2.length, s"shard $s1 pivot shape drifted")
      p1.zip(p2).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    val qdf = qs.toDF("q_id", "qv")
    val files = rows(graft.index.SingleFileIndex.serveSharded(
      qdf, fd, k, beam, nprobe = 1, distinctMerge = true))
    val mem = rows(VamanaIndex.searchProbed(idx, qs.toArray, k, beam, params,
      nprobe = 1, pivots = Some(metaPivots), distinctMerge = true))
    assert(files == mem,
      s"first diff: ${files.zip(mem).find { case (a, b) => a != b }}")
    val overR = recallOf(mem)
    assert(overR >= plainR - 1e-9,
      s"overlap-compacted recall $overR below plain-compacted $plainR at nprobe=1")
    assert(overR >= 0.7, s"overlap-compacted nprobe=1 recall $overR below 0.7")
  }

  test("FreshDiskANN in-place merge: live-set recall >= rebuild-compaction, no build job in the path") {
    // the §4.2 delete merge (patch in-neighbors of tombstoned nodes
    // with their live out-neighbors, α-re-prune) vs compact()'s full
    // rebuild, on the SAME corpus and delete set. Everything here is
    // deterministic (seeded build, fixed delete set), so both recalls
    // and the job counts reproduce exactly.
    val pM = "/tmp/graft_merge_spec_idx"
    val pC = "/tmp/graft_merge_spec_idx_c"
    Seq(pM, pC).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val built = VamanaIndex.build(
      Tables.embeddings(spark, SparkSpecBase.sf001), params, numShards = 2).persist()
    VamanaIndex.save(built, params, pM)
    VamanaIndex.save(built, params, pC)
    val before: Map[Long, (Int, Seq[Long])] = built.collect()
      .map(r => r.vec_id -> ((r.shard, r.neighbors.toSeq))).toMap
    built.unpersist()
    val dels: Set[Long] = all.keySet.filter(_ % 7 == 0)
    StreamingIndex.delete(spark, pM, dels.toSeq)
    StreamingIndex.delete(spark, pC, dels.toSeq)

    val sc = spark.sparkContext
    sc.setJobGroup("fresh_merge", "in-place merge")
    StreamingIndex.merge(spark, pM, params)
    sc.clearJobGroup()
    sc.setJobGroup("rebuild_compact", "rebuild compaction")
    StreamingIndex.compact(spark, pC, params, numShards = 2)
    sc.clearJobGroup()
    val mergeJobs = sc.statusTracker.getJobIdsForGroup("fresh_merge").length
    val compactJobs = sc.statusTracker.getJobIdsForGroup("rebuild_compact").length
    // the merge path runs NO graph-construction job: one patch scan +
    // the save actions. compact() pays the multi-pass build on top of
    // the same save — strictly more jobs, and the absolute bound pins
    // that no build pass snuck into merge
    info(s"merge jobs: $mergeJobs, compact jobs: $compactJobs")
    assert(mergeJobs > 0 && mergeJobs < compactJobs,
      s"merge ran $mergeJobs jobs vs compact's $compactJobs — no-rebuild contract broken")
    // the save tail (write/stats/routing/pivot actions) dominates the
    // merge's job count; the patch itself is ONE scan. A build pass
    // would add the multi-pass refinement loop's jobs on top — the
    // absolute bound sits between the two (merge measured 24, compact
    // with the identical save tail measured above it)
    assert(mergeJobs <= 26, s"merge ran $mergeJobs jobs — more than patch-scan+save needs")

    // physical contract: tombstoned rows gone, log retired, neighbor
    // lists live-only and degree-bounded
    assert(!new java.io.File(s"$pM/tombstones").exists(), "merge did not retire the log")
    val merged = VamanaIndex.load(spark, pM)
      .as[(Long, Array[Float], Int, Array[Long])].collect()
    assert(merged.map(_._1).toSet == all.keySet.diff(dels), "merged live set wrong")
    merged.foreach { case (id, _, _, nbrs) =>
      nbrs.foreach(n => assert(!dels(n), s"node $id still points at tombstoned $n"))
      assert(nbrs.length <= params.maxDegree, s"node $id degree ${nbrs.length}")
    }
    // IN-PLACE, not rebuilt — the structural proof job counts can't
    // give (the rebuild hides inside the same save actions): a live
    // node with no tombstoned neighbor must keep its neighbor list
    // byte-identical (and its shard), which no fresh build would
    // reproduce; and at this delete rate most nodes are untouched
    var untouched = 0
    merged.foreach { case (id, _, shard, nbrs) =>
      val (oldShard, oldNbrs) = before(id)
      assert(shard == oldShard, s"merge moved node $id across shards")
      if (oldNbrs.forall(n => !dels(n))) {
        untouched += 1
        assert(nbrs.toSeq == oldNbrs,
          s"untouched node $id had its neighbors rewritten — merge is rebuilding")
      }
    }
    // at delete rate 1/7 and degree ≤16, P(no deleted neighbor) ≈
    // (6/7)^16 ≈ 8% — a few dozen nodes, enough for the identity pin
    assert(untouched >= 10,
      s"only $untouched/${merged.length} untouched nodes — pin has no teeth")

    // recall: both lifecycles answer the same live queries; the merge
    // must not lose to the rebuild (the paper's claim — and the reason
    // the in-place path is usable at scale)
    val qids = all.keySet.filter(id => !dels(id) && id % 9 == 0).toSeq.sorted.take(60)
    val qs = qids.map(id => (id, all(id))).toArray
    def recallOf(indexPath: String): Double = {
      val served = StreamingIndex.searchLive(spark, indexPath, qs, k, beam, params)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qids.map { id =>
        val exact = all.view.filterKeys(x => !dels(x)).toSeq
          .sortBy { case (xid, v) => (cosDist(all(id), v), xid) }.take(k).map(_._1).toSet
        (exact & served.getOrElse(id, Set.empty)).size.toDouble / k
      }.sum / qids.size
    }
    val mergeR = recallOf(pM)
    val compactR = recallOf(pC)
    info(f"in-place merge recall $mergeR%.3f vs rebuild-compaction $compactR%.3f")
    assert(mergeR >= compactR - 1e-9,
      s"in-place merge recall $mergeR lost to rebuild-compaction's $compactR")
    assert(mergeR >= 0.8, s"merged live-set recall $mergeR below the 0.8 floor")
    Seq(pM, pC).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("in-place merge on an OVERLAP index: every replica of a deleted id goes, split survives") {
    // the headline tier replicates ids across shards — the merge must
    // drop ALL replicas (rows and edges) shard-locally, keep the
    // replicated graph serving under distinctMerge, and carry the
    // capped build's split factor through the re-save (primary pivot
    // sampling groups sibling sub-shards by it)
    val p = "/tmp/graft_merge_overlap_spec_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val (built, split) = VamanaIndex.buildOverlappedCapped(
      Tables.embeddings(spark, SparkSpecBase.sf001), params, numShards = 2, overlap = 2)
    VamanaIndex.save(built, params, p, split = split)
    val dels: Set[Long] = all.keySet.filter(_ % 6 == 0)
    StreamingIndex.delete(spark, p, dels.toSeq)
    StreamingIndex.merge(spark, p, params)
    val merged = VamanaIndex.load(spark, p)
      .as[(Long, Array[Float], Int, Array[Long])].collect()
    val liveIds = merged.map(_._1).toSet
    assert(liveIds == all.keySet.diff(dels), "overlap merge changed the live id set")
    assert(merged.length > liveIds.size, "overlap merge lost the replicas")
    merged.foreach { case (id, _, _, nbrs) =>
      nbrs.foreach(n => assert(!dels(n), s"replica row $id still points at tombstoned $n")) }
    // split factor must survive the merge's re-save
    val meta = graft.index.MetaJson.parse(VamanaIndex.loadMeta(p))
    assert(meta.get("split").asInt() == split,
      s"merge dropped split=$split from metadata")
    // and the merged replicated graph still serves correctly
    val qs = Seq(1L, 7L, 13L).map(id => (id, all(id))).toArray
    val got = VamanaIndex.search(VamanaIndex.load(spark, p), qs, k, beam, params)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    qs.foreach { case (id, _) =>
      assert(got.filter(_._1 == id).map(_._2).contains(id),
        s"live $id not found by the merged overlap index") }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
  }

  test("tombstones through FILTERED serving: live-set recall, and exclusion == relabeling") {
    // the delete log must reach every serving path, not just the
    // plain tier: filtered search drops tombstoned ids from RESULTS
    // while they keep ROUTING (the same lazy-delete contract).
    val emb = Tables.embeddings(spark, SparkSpecBase.sf001)
    val idx = VamanaIndex.build(emb, params, numShards = 2).cache()
    val labels = emb.select($"vec_id",
      ($"vec_id" % 3).cast("int").as("label"))
    val target = 1
    val dels: Array[Long] = all.keySet.filter(id => id % 3 == 1 && id % 2 == 0)
      .toArray.sorted
    val qs = Seq(1L, 7L, 13L).map(id => (id, all(id))).toArray
    val got = VamanaIndex.searchFiltered(idx, labels, qs, k, beam, params,
        target, tombstones = dels)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nid) =>
      assert(nid % 3 == target, s"off-label $nid served")
      assert(java.util.Arrays.binarySearch(dels, nid) < 0, s"tombstoned $nid served")
    }
    // live-set recall vs exact cosine top-k over LIVE target-label ids
    val recall = qs.map { case (qid, qv) =>
      val truth = all.toSeq
        .filter { case (id, _) => id % 3 == target &&
          java.util.Arrays.binarySearch(dels, id) < 0 }
        .sortBy { case (id, v) => (cosDist(qv, v), id) }.take(k).map(_._1).toSet
      val mine = got.filter(_._1 == qid).map(_._2).toSet
      (truth & mine).size.toDouble / k
    }.sum / qs.length
    info(s"filtered live-set recall@$k = $recall")
    assert(recall >= 0.9, s"filtered live-set recall $recall < 0.9")
    // ROW-IDENTITY: excluding by tombstone must equal excluding by
    // relabeling the same ids to a non-target label — the two allow
    // predicates are extensionally equal over an identical traversal
    val relabeled = emb.select($"vec_id",
      org.apache.spark.sql.functions.when(
        $"vec_id".isInCollection(dels.toSeq), 2)
        .otherwise(($"vec_id" % 3).cast("int")).as("label"))
    val viaRelabel = VamanaIndex.searchFiltered(idx, relabeled, qs, k, beam,
        params, target)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val viaTombs = VamanaIndex.searchFiltered(idx, labels, qs, k, beam, params,
        target, tombstones = dels)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(viaTombs.sameElements(viaRelabel),
      "tombstone exclusion diverged from the equivalent relabeling")
    idx.unpersist()
  }

  test("tombstones through STITCHED serving: exclusion row-identity and multi-label coverage") {
    import graft.index.StitchedIndex
    val emb = Tables.embeddings(spark, SparkSpecBase.sf001)
    // multi-label membership: every id carries label id%3; ids %7==0
    // ALSO join label 2 — a delete must vanish from BOTH graphs
    val labels = emb.select($"vec_id", ($"vec_id" % 3).cast("int").as("label"))
      .union(emb.filter($"vec_id" % 7 === 0)
        .select($"vec_id", org.apache.spark.sql.functions.lit(2).as("label")))
    val idx = StitchedIndex.build(emb, labels, params, targetShardRows = 1000)
      .cache()
    val dels: Array[Long] = all.keySet.filter(id => id % 14 == 0).toArray.sorted
    val qs = Seq(1L, 7L, 13L).map(id => (id, all(id))).toArray
    for (target <- 0 to 2) {
      val got = StitchedIndex.search(idx, qs, k, beam, params, target,
          tombstones = dels)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      assert(got.nonEmpty)
      got.foreach { case (_, nid) =>
        assert(java.util.Arrays.binarySearch(dels, nid) < 0,
          s"tombstoned $nid served from label $target") }
    }
    // row-identity 1: a log that touches NO member of the target
    // label is a no-op (exclusion is exact, never approximate)
    val offLabel: Array[Long] = all.keySet
      .filter(id => id % 3 == 0 && id % 7 != 0).toArray.sorted
    val plain = StitchedIndex.search(idx, qs, k, beam, params, 1)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val noop = StitchedIndex.search(idx, qs, k, beam, params, 1,
        tombstones = offLabel)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(noop.sameElements(plain),
      "an off-label tombstone log changed stitched results")
    // row-identity 2: exclusion == post-filtering a widened search
    // (k + |dels ∩ label|'s safe upper bound) — the kernel returns the
    // best k LIVE ids, which a deep-enough unexcluded list reproduces
    val target = 2
    val wide = StitchedIndex.search(idx, qs, k + dels.length, beam, params,
        target)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val wantPost = wide.iterator
      .filter(r => java.util.Arrays.binarySearch(dels, r._3) < 0)
      .toSeq.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).take(k).map(_._3)).toMap
    val gotEx = StitchedIndex.search(idx, qs, k, beam, params, target,
        tombstones = dels)
      .select($"q_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(gotEx == wantPost,
      "stitched exclusion diverged from post-filtering the widened search")
    idx.unpersist()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{StitchedIndex, VamanaIndex}

/** Label-stitched filtered serving (Filtered-DiskANN's StitchedVamana
  * form): per-label graphs must (a) return only matching vectors and
  * recall the exact filtered truth at the PLAIN beam, (b) hold the
  * recall floor at ≤1% selectivity where the one-graph tier needs
  * beam ≈ k/selectivity, (c) admit multi-label membership, (d) be
  * deterministic, and (e) round-trip through the label-partitioned
  * on-disk layout row-identically. */
class StitchedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private val dir = SparkSpecBase.sf001
  private val Target = 3

  private lazy val vecs = Tables.embeddings(spark, dir)
    .select($"vec_id", $"embedding", $"label")
    .as[(Long, Array[Float], Int)].collect().sortBy(_._1)

  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
    }
    1.0 - dot / (math.max(math.sqrt(na), java.lang.Double.MIN_NORMAL) *
      math.max(math.sqrt(nb), java.lang.Double.MIN_NORMAL))
  }

  private def recallOf(res: Array[(Long, Long)],
      queries: Array[(Long, Array[Float])],
      members: Array[(Long, Array[Float])], k: Int): Double = {
    val approx = res.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    queries.map { case (qid, qv) =>
      val kk = math.min(k, members.length)
      val truth = members.map { case (nid, v) => (nid, cosDist(qv, v)) }
        .sortBy { case (nid, d) => (d, nid) }.take(kk).map(_._1).toSet
      (truth & approx.getOrElse(qid, Set.empty)).size.toDouble / kk
    }.sum / queries.length
  }

  test("stitched search returns only target-label vectors and recalls truth at plain beam") {
    val res = StitchedIndex.qVamanaStitched(spark, dir)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    assert(res.nonEmpty)
    res.foreach { case (q, nid) =>
      assert(labelOf(nid) == Target, s"q $q returned label ${labelOf(nid)} vector $nid")
    }
    val queries = vecs.filter(_._1 % 50 == 0).map(v => (v._1, v._2))
    val members = vecs.filter(_._3 == Target).map(v => (v._1, v._2))
    val recall = recallOf(res, queries, members, 10)
    info(f"stitched recall@10=$recall%.4f at beam 64 (no selectivity widening)")
    assert(recall >= 0.9, f"stitched recall@10 $recall%.4f under 0.9 at plain beam")
  }

  test("<=1% selectivity: plain beam holds the floor the one-graph tier needs k/sel for") {
    // the whole point of the per-label family: where searchFiltered's
    // heuristic widens beam to k/selectivity (= 1280 at 0.78%), the
    // stitched tier runs beam = 4k over exactly the match set
    val bigDir = SparkSpecBase.sf1
    val all = Tables.embeddings(spark, bigDir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val isMatch = (id: Long) => id % 128 == 5
    val sel = all.count(v => isMatch(v._1)).toDouble / all.length
    assert(sel <= 0.01, f"synthetic predicate selectivity $sel%.4f not <=1%%")
    val labels = all.map { case (id, _) =>
      (id, if (isMatch(id)) 1 else 0) }.toSeq.toDF("vec_id", "label")
    val emb = Tables.embeddings(spark, bigDir).select($"vec_id", $"embedding")
    val queries = all.filter(_._1 % 500 == 0)
    val k = 10
    val beam = 4 * k
    val idx = StitchedIndex.build(emb, labels, VamanaIndex.qParams,
      targetShardRows = 2000)
    val res = StitchedIndex.search(idx, queries, k, beam,
      VamanaIndex.qParams, target = 1)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    res.foreach { case (q, nid) =>
      assert(isMatch(nid), s"q $q returned non-matching vector $nid") }
    val members = all.filter(v => isMatch(v._1))
    val recall = recallOf(res, queries, members, k)
    // the one-graph tier at the SAME small beam, for contrast
    val plain = VamanaIndex.searchFiltered(
      VamanaIndex.cachedIndex(spark, bigDir), labels, queries, k, beam,
      VamanaIndex.qParams, target = 1)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    val plainRecall = recallOf(plain, queries, members, k)
    info(f"selectivity=$sel%.4f beam=$beam stitched=$recall%.4f one-graph=$plainRecall%.4f")
    assert(recall >= 0.9, f"stitched low-selectivity recall@10 $recall%.4f under 0.9")
    assert(recall >= plainRecall,
      f"stitched $recall%.4f under the one-graph tier's $plainRecall%.4f at equal beam")
  }

  test("multi-label membership: a vector serves from each of its labels' graphs") {
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val extra = vecs.take(5).map(v => (v._1, 99)).toSeq.toDF("vec_id", "label")
    val labels = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label").union(extra)
    val idx = StitchedIndex.build(emb, labels, VamanaIndex.qParams,
      targetShardRows = 2000)
    val queries = vecs.take(5).map(v => (v._1, v._2))
    val via99 = StitchedIndex.search(idx, queries, 3, 64,
      VamanaIndex.qParams, target = 99)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(via99.nonEmpty && via99.subsetOf(vecs.take(5).map(_._1).toSet))
    // the same vectors still serve from their original label's graph
    val orig = vecs.take(5).groupBy(_._3).keySet.head
    val viaOrig = StitchedIndex.search(idx, queries, 3, 64,
      VamanaIndex.qParams, target = orig)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(viaOrig.nonEmpty)
    viaOrig.foreach(nid => assert(vecs.find(_._1 == nid).get._3 == orig))
  }

  test("multi-cell labels: a label split across Voronoi cells still recalls its truth") {
    // the env-gated 2M rehearsal is the only other multi-cell
    // exercise — this pins the offsets/cell arithmetic (global shard
    // ids, per-cell graphs, cross-cell TopK merge) in the default
    // suite: targetShardRows=8 splits every ~20-member label into
    // 2-3 cells
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val labels = Tables.embeddings(spark, dir).select($"vec_id", $"label")
    val idx = StitchedIndex.build(emb, labels, VamanaIndex.qParams,
      targetShardRows = 8)
    val members = vecs.filter(_._3 == Target).map(v => (v._1, v._2))
    val nCells = idx.filter($"label" === Target)
      .select($"shard").distinct().count()
    assert(nCells >= 2, s"label $Target not split: $nCells cell(s)")
    val queries = vecs.filter(_._1 % 50 == 0).map(v => (v._1, v._2))
    val res = StitchedIndex.search(idx, queries, 10, 64,
      VamanaIndex.qParams, Target)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    res.foreach { case (q, nid) => assert(labelOf(nid) == Target,
      s"q $q returned label ${labelOf(nid)} vector $nid") }
    val recall = recallOf(res, queries, members, 10)
    info(f"cells=$nCells recall@10=$recall%.4f")
    assert(recall >= 0.9,
      f"multi-cell recall@10 $recall%.4f under 0.9 across $nCells cells")
  }

  test("stitched search is deterministic") {
    val a = StitchedIndex.qVamanaStitched(spark, dir).collect().toSeq
    val b = StitchedIndex.qVamanaStitched(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("hot-label resident serve is row-identical to the one-shot search path") {
    // qVamanaStitched rides the persisted-label + resident-graph tier;
    // the generic search() runs the per-call filter + shuffle +
    // rebuild. Same kernel, same beam, same merge -> same rows, or
    // the resident tier is changing answers.
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val resident = pairs(StitchedIndex.qVamanaStitched(spark, dir))
    val queries = vecs.filter(_._1 % 50 == 0).map(v => (v._1, v._2))
    val oneShot = pairs(StitchedIndex.search(
      StitchedIndex.cachedIndex(spark, dir), queries, 10, 64,
      VamanaIndex.qParams, target = Target))
    assert(resident == oneShot,
      s"resident tier drifted: ${resident.diff(oneShot).size} extra, " +
        s"${oneShot.diff(resident).size} missing")
  }

  test("save/load round-trip: label-partitioned layout, row-identical serving") {
    val idx = StitchedIndex.cachedIndex(spark, dir)
    val path = TempCleanup.onExit(
      s"/tmp/graft_stitched_spec_${spark.sparkContext.applicationId}")
    StitchedIndex.save(idx, VamanaIndex.qParams, path, targetShardRows = 2000)
    // at-rest layout IS partitioned by label — the property that turns
    // the label predicate into partition pruning at scale
    assert(new java.io.File(s"$path/graph/label=$Target").isDirectory,
      s"expected label=$Target partition directory under $path/graph")
    val loaded = StitchedIndex.load(spark, path)
    val queries = vecs.filter(_._1 % 50 == 0).map(v => (v._1, v._2))
    val a = StitchedIndex.search(idx, queries, 10, 64,
      VamanaIndex.qParams, Target).collect().toSeq
    val b = StitchedIndex.search(loaded, queries, 10, 64,
      VamanaIndex.qParams, Target).collect().toSeq
    assert(a == b, "loaded index diverged from the in-memory build")
    // the persisted params round-trip exactly, so callers can serve
    // with the BUILD metric instead of trusting their own copy
    val (p, tsr) = StitchedIndex.loadParams(path)
    assert(p == VamanaIndex.qParams, s"persisted params diverged: $p")
    assert(tsr == 2000)
    // a dir that is not a stitched index must fail loudly at load, not
    // serve wrong-metric results
    val foreign = TempCleanup.onExit(
      s"/tmp/graft_stitched_foreign_${spark.sparkContext.applicationId}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(foreign))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$foreign/metadata.json"),
      """{"format":"something-else"}""")
    val e = intercept[IllegalArgumentException] {
      StitchedIndex.load(spark, foreign)
    }
    assert(e.getMessage.contains("something-else"), e.getMessage)
  }
}

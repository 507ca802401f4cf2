package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{MmapIndex, SingleFileIndex, VamanaIndex, VamanaParams}

/** Scratch diagnostic (GRAFT_BINDBG): isolate why the dim-1536
  * file-tier rehearsal read recall 0 — checks exact mmap search,
  * self-match, and id mapping layer by layer on a small corpus. */
class BinDebugSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("layered diagnosis at dim 1536 (GRAFT_BINDBG)") {
    assume(sys.env.contains("GRAFT_BINDBG"), "GRAFT_BINDBG not set")
    val n = sys.env.get("GRAFT_BINDBG_N").map(_.toInt).getOrElse(2000)
    val nSh = sys.env.get("GRAFT_BINDBG_SH").map(_.toInt).getOrElse(8)
    val dim = 1536
    val emb = spark.range(n.toLong)
      .map(id => (id, HiDimGen.genClusteredVec(id, dim, 64)))
      .toDF("vec_id", "embedding")
    val params = VamanaParams(maxDegree = 32, buildBeamWidth = 128,
      alpha = 1.2, passes = 2, extraSeeds = 2, seed = 42L, metric = "cosine")
    val idx = VamanaIndex.buildMerged(emb, params, numShards = nSh).persist()
    info(s"index rows: ${idx.count()} (n=$n)")
    val file = "/tmp/graft_bindbg.idx"
    SingleFileIndex.export(idx, params, file)
    val corpus = Array.tabulate(n)(i => HiDimGen.genClusteredVec(i.toLong, dim, 64))
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val mm = new MmapIndex(file)
    try {
      // layer 1: vector round-trip — does file row id hold corpus row id?
      val v0 = mm.vector(17)
      val d17 = cosDist(v0, corpus(17))
      info(f"file row 17 vs corpus 17 cos dist: $d17%.6f")
      // layer 2: exact mmap search self-match
      val qv = corpus(100)
      val res = mm.search(qv, 10, 64)
      info(s"exact search for corpus(100): head=${res.take(3).mkString(", ")}")
      val truth = corpus.zipWithIndex.map { case (v, i) => (cosDist(qv, v), i.toLong) }
        .sorted.take(10)
      info(s"truth head: ${truth.take(3).mkString(", ")}")
      val rec = res.count { case (nid, _) => truth.map(_._2).contains(nid) }
      info(s"exact-search recall@10 for this query: $rec/10")
      // layer 3: PQ-steered search on the same query
      val (cb, codes) = mm.buildPqState(m = 192, ksub = 16, iters = 5)
      val resPq = mm.searchPq(qv, 10, 64, cb, codes)
      info(s"searchPq head: ${resPq.take(5).mkString(", ")}")
      val recPq = resPq.count { case (nid, _) => truth.map(_._2).contains(nid) }
      info(s"searchPq recall@10: $recPq/10")
      // layer 4: what does ADC think of the true neighbors vs returned?
      val lut = cb.lut(qv.map(x => x)) // qv not normalized — check raw first
      val qn = { var s = 0.0; var i = 0; while (i < dim) { s += qv(i).toDouble * qv(i); i += 1 }
        math.sqrt(s) }
      val qNorm = qv.map(x => (x / qn).toFloat)
      val lutN = cb.lut(qNorm)
      def adcOf(l: Array[Double], row: Int): Double = cb.adc(l, codes, row)
      info(s"ADC(norm q) of true top-3 ${truth.take(3).map(t => (t._2, adcOf(lutN, t._2.toInt))).mkString(", ")}")
      info(s"ADC(norm q) of searchPq top-3 ${resPq.take(3).map(t => (t._1, adcOf(lutN, t._1.toInt))).mkString(", ")}")
      info(s"ADC(norm q) of entry ${adcOf(lutN, 0)} / random rows ${Seq(500, 1000, 1500).map(adcOf(lutN, _)).mkString(", ")}")
      // layer 5: wider beam
      val resPqWide = mm.searchPq(qv, 10, 256, cb, codes)
      val recPqWide = resPqWide.count { case (nid, _) => truth.map(_._2).contains(nid) }
      info(s"searchPq recall@10 at beam 256: $recPqWide/10")
      assert(d17 < 1e-6)
    } finally mm.close()
  }
}

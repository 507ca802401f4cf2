package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.index.PqCodebook

/** The recorded residual-vs-residual-free IVF+PQ comparison behind
  * `q_knn_ivfpq_res` (Jégou et al., IEEE TPAMI 2011 §IV-A).
  *
  * Two findings, both pinned:
  *
  * 1. On the SEED (untrained) quantizers the oracle-replayable chains
  *    use, residual encoding does NOT win: the coarse "centroids" are
  *    16 arbitrary corpus vectors, so residuals are not low-energy
  *    and the residual codebook (residuals of the next 16 ids) is as
  *    arbitrary as the raw one — measured recall@10 at sf0.01 reads
  *    0.46 (free) vs 0.36 (residual) under the 0.50 probe ceiling.
  *    The first test pins those values as determinism floors.
  *
  * 2. The §IV-A advantage is real in the TRAINED regime production
  *    runs: with converged coarse centroids and Lloyd-trained
  *    codebooks on clustered data, residuals carry only the
  *    within-cell noise, the residual codebook spends its entries on
  *    that scale, and both quantization error and ADC candidate
  *    recall beat the raw form decisively. The second test pins that
  *    on the deterministic kernel ([[PqCodebook]]).
  */
class ResidualPqSpec extends AnyFunSuite {
  private val spark = SparkSpecBase.spark
  import spark.implicits._

  test("seed-quantizer chains: recall recorded; residual rides the same probe ceiling") {
    val dir = SparkSpecBase.sf01
    val corpus = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val queries = corpus.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    // materialized locally (1k rows) so the recall join can't collide
    // expression ids with the PQ chains' shared corpus scan
    val exact = plans.KnnJoin(corpus, queries, 10, "l2", excludeSelf = true)
      .select($"q_id", $"neighbor_id").as[(Long, Long)].collect()
      .toSeq.toDF("q_id", "neighbor_id")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      index.VamanaIndex.recallDf(df.select($"q_id", $"neighbor_id"), exact)
        .head().getDouble(0)
    val free = recallOf(operators.PQ.qKnnIvfPq(spark, dir))
    val res = recallOf(operators.PQ.qKnnIvfPqRes(spark, dir))
    // the r15 gated trained-residual chain (q_knn_ivfpq_res_trained):
    // two distributed Lloyd rounds over the residuals — §IV-A's
    // production configuration, now oracle-verified end to end
    val resT = recallOf(operators.PQ.qKnnIvfPqResTrained(spark, dir))
    info(f"recall@10 residual-free=$free%.4f residual=$res%.4f " +
      f"trained-residual=$resT%.4f (probe ceiling 0.50)")
    // determinism floors at the measured sf0.01 values (chains are
    // fully deterministic; slack only against corpus regeneration)
    assert(free >= 0.44, f"residual-free recall@10 $free%.4f under its 0.44 floor")
    assert(res >= 0.34, f"residual recall@10 $res%.4f under its 0.34 floor")
    // training must not LOSE to the seed residual codebook — Lloyd
    // lowers residual quantization error, which is what ADC ranks by
    assert(resT >= res, f"trained residual $resT%.4f under seed residual $res%.4f")
    assert(resT >= 0.37, f"trained residual recall@10 $resT%.4f under its 0.37 floor " +
      "(measured 0.39 at sf0.01)")
    operators.PQ.release(spark)
  }

  // ---- trained-regime kernel comparison -------------------------------

  private val Dim = 16
  private val NCells = 8
  private val N = 2000
  private val M = 4
  private val Ksub = 8

  private def mix(zIn: Long): Long = {
    var x = zIn
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  /** Deterministic float in [-scale, scale) from a splitmix64 stream. */
  private def rnd(seed: Long, i: Long, scale: Float): Float = {
    val x = mix(seed + i * 0x9e3779b97f4a7c15L)
    ((x & 0xffff).toFloat / 65536f - 0.5f) * 2f * scale
  }

  /** Clustered corpus: NCells well-separated centers, points =
    * center + small noise; the generating cell is the (converged)
    * coarse assignment. */
  private lazy val (centers, points, cellOf) = {
    val cs = Array.tabulate(NCells, Dim)((c, d) => rnd(11L, c * Dim + d, 1.0f))
    val cell = Array.tabulate(N)(i => i % NCells)
    val pts = new Array[Float](N * Dim)
    var i = 0
    while (i < N) {
      var d = 0
      while (d < Dim) {
        pts(i * Dim + d) = cs(cell(i))(d) + rnd(23L, i.toLong * Dim + d, 0.12f)
        d += 1
      }
      i += 1
    }
    (cs, pts, cell)
  }

  private lazy val residuals = {
    val out = new Array[Float](N * Dim)
    var i = 0
    while (i < N) {
      var d = 0
      while (d < Dim) {
        out(i * Dim + d) = points(i * Dim + d) - centers(cellOf(i))(d)
        d += 1
      }
      i += 1
    }
    out
  }

  test("trained regime: residual PQ quantizes tighter AND ranks candidates better") {
    val cbRaw = PqCodebook.train(points, Dim, N, M, Ksub, iters = 5)
    val cbRes = PqCodebook.train(residuals, Dim, N, M, Ksub, iters = 5)
    val mseRaw = cbRaw.meanSqError(points, N)
    val mseRes = cbRes.meanSqError(residuals, N)
    info(f"trained MSE raw=$mseRaw%.5f residual=$mseRes%.5f")
    // residuals are the within-cell noise — the same code budget must
    // quantize them far tighter than the full vectors
    assert(mseRes < mseRaw * 0.5,
      f"residual MSE $mseRes%.5f not clearly under raw $mseRaw%.5f")

    val codesRaw = cbRaw.encodeAll(points, N)
    val codesRes = cbRes.encodeAll(residuals, N)
    val K = 10; val Cand = 50; val NQ = 32
    def topIdx(score: Int => Double, skip: Int, k: Int): Array[Int] =
      (0 until N).filter(_ != skip).map(i => (score(i), i))
        .sortBy(identity).take(k).map(_._2).toArray
    var sumRaw = 0.0; var sumRes = 0.0
    var q = 0
    while (q < NQ) {
      val qv = java.util.Arrays.copyOfRange(points, q * Dim, (q + 1) * Dim)
      val ex = topIdx(i => {
        var acc = 0.0; var d = 0
        while (d < Dim) {
          val df = points(i * Dim + d).toDouble - qv(d).toDouble
          acc += df * df; d += 1
        }
        acc
      }, q, K).toSet
      // raw ADC: one LUT per query over the whole corpus
      val lutRaw = cbRaw.lut(qv)
      val candRaw = topIdx(i => cbRaw.adc(lutRaw, codesRaw, i), q, Cand).toSet
      // residual ADC: one LUT per (query, cell) — all cells probed, so
      // the comparison isolates encoding quality from probe loss
      val lutRes = Array.tabulate(NCells) { c =>
        val qr = new Array[Float](Dim)
        var d = 0
        while (d < Dim) { qr(d) = qv(d) - centers(c)(d); d += 1 }
        cbRes.lut(qr)
      }
      val candRes = topIdx(i => cbRes.adc(lutRes(cellOf(i)), codesRes, i), q, Cand).toSet
      sumRaw += ex.count(candRaw).toDouble / K
      sumRes += ex.count(candRes).toDouble / K
      q += 1
    }
    val recRaw = sumRaw / NQ; val recRes = sumRes / NQ
    info(f"trained candidate recall@$K-in-$Cand raw=$recRaw%.4f residual=$recRes%.4f")
    assert(recRes >= recRaw,
      f"trained residual candidate recall $recRes%.4f under raw $recRaw%.4f")
    // measured 0.866 vs raw's 0.144 — floor with headroom
    assert(recRes >= 0.8, f"trained residual candidate recall $recRes%.4f under 0.8")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.PqCodebook

/** Trained-PQ kernel properties: training must help (never hurt) the
  * quantization error, bulk encoding must equal the per-row kernel,
  * and ADC must be consistent with the quantization error it is built
  * from. */
class PqCodebookSpec extends AnyFunSuite {

  private val n = 256
  private val dim = 16

  /** Deterministic synthetic corpus (splitmix64 stream). */
  private lazy val vecs: Array[Float] = {
    val out = new Array[Float](n * dim)
    var z = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < out.length) {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      out(i) = ((x ^ (x >>> 31)) & 0xffff).toFloat / 65536f - 0.5f
      i += 1
    }
    out
  }

  test("training strictly improves mean squared error over the seed codebook") {
    val seed = PqCodebook.train(vecs, dim, n, m = 4, ksub = 8, iters = 0)
    val trained = PqCodebook.train(vecs, dim, n, m = 4, ksub = 8, iters = 5)
    val eSeed = seed.meanSqError(vecs, n)
    val eTrained = trained.meanSqError(vecs, n)
    assert(eTrained <= eSeed + 1e-12, s"training worsened MSE: $eSeed -> $eTrained")
    assert(eTrained < eSeed, s"5 Lloyd iterations should beat the raw seed ($eSeed)")
  }

  test("distributed trained codebooks beat the seed codebooks on the gated surface") {
    // the Jégou §IV-A claim on the REAL corpus through the gate's own
    // distributed Lloyd (q_knn_pq_trained's codebook): total corpus
    // quantization error must drop vs the seed codebook, and the
    // training must be deterministic call to call
    val spark = SparkSpecBase.spark
    import spark.implicits._
    val dir = SparkSpecBase.sf001
    val seed = operators.PQ.codebooks(spark, dir)
    val trained = operators.PQ.trainedCodebooks(spark, dir)
    assert(trained.sameElements(operators.PQ.trainedCodebooks(spark, dir)))
    val corpus = Tables.embeddings(spark, dir)
      .select($"embedding").as[Array[Float]].collect()
    def totalErr(cb: Array[Float]): Double =
      corpus.map(v => operators.PQ.encodeOne(v, cb)._2.sum).sum
    val eSeed = totalErr(seed)
    val eTrained = totalErr(trained)
    assert(eTrained < eSeed,
      s"distributed training worsened corpus error: $eSeed -> $eTrained")
  }

  test("encodeAll equals the per-row kernel; ADC of a row equals its quantization error") {
    val cb = PqCodebook.train(vecs, dim, n, m = 4, ksub = 8, iters = 3)
    val bulk = cb.encodeAll(vecs, n)
    val scratch = new Array[Byte](cb.m)
    var i = 0
    while (i < n) {
      val err = cb.encodeInto(vecs, i * dim, scratch, 0)
      assert(java.util.Arrays.equals(
        scratch, java.util.Arrays.copyOfRange(bulk, i * cb.m, (i + 1) * cb.m)),
        s"row $i: bulk and per-row codes differ")
      // ADC(q = row i, codes of row i) is exactly the row's own
      // quantization error — the identity the two-tier rerank relies on
      val row = java.util.Arrays.copyOfRange(vecs, i * dim, (i + 1) * dim)
      val adc = cb.adc(cb.lut(row), bulk, i)
      assert(math.abs(adc - err) < 1e-9, s"row $i: adc $adc vs encode err $err")
      i += 1
    }
  }
}

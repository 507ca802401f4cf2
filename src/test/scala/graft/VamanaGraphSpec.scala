package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{Metric, VamanaGraph, VamanaParams}

class VamanaGraphSpec extends AnyFunSuite {

  private def flat(vs: Array[Array[Float]]): Array[Float] = vs.flatten

  private def bruteKnn(vs: Array[Array[Float]], q: Array[Float], k: Int, m: Metric): Array[Int] =
    vs.indices
      .map(i => (i, m.eval(q, 0, vs(i), 0, q.length)))
      .sortBy { case (i, d) => (d, i) }.take(k).map(_._1).toArray

  test("grid connectivity: every grid point finds its close neighbors (L2)") {
    val vs = (for (i <- 0 until 5; j <- 0 until 5) yield Array(i.toFloat, j.toFloat)).toArray
    val p = VamanaParams(maxDegree = 4, buildBeamWidth = 32, alpha = 1.5, metric = "l2")
    val g = new VamanaGraph(flat(vs), 2, vs.length, p).build()
    for (t <- vs.indices) {
      val res = g.search(vs(t), 5, 32).map(_._1)
      assert(res.contains(t), s"point $t should find itself")
      // all returned points within L2 5.0 of query (reference test_grid_connectivity)
      res.foreach { r =>
        assert(Metric.L2.eval(vs(t), 0, vs(r), 0, 2) < 5.0)
      }
    }
  }

  test("deterministic: same seed → identical graph") {
    val rnd = new java.util.Random(7)
    val vs = Array.fill(120)(Array.fill(16)(rnd.nextFloat()))
    val p = VamanaParams(maxDegree = 8, buildBeamWidth = 32, metric = "cosine")
    val g1 = new VamanaGraph(flat(vs), 16, vs.length, p).build()
    val g2 = new VamanaGraph(flat(vs), 16, vs.length, p).build()
    assert(g1.graph.zip(g2.graph).forall { case (a, b) => a.sameElements(b) })
  }

  test("recall@10 >= 0.9 vs brute force on random vectors (cosine)") {
    val rnd = new java.util.Random(13)
    val vs = Array.fill(400)(Array.fill(32)(rnd.nextFloat() - 0.5f))
    val p = VamanaParams(maxDegree = 24, buildBeamWidth = 64, metric = "cosine")
    val g = new VamanaGraph(flat(vs), 32, vs.length, p).build()
    val recalls = (0 until 20).map { qi =>
      val q = vs(qi * 17 % vs.length)
      val exact = bruteKnn(vs, q, 10, Metric.Cosine).toSet
      val approx = g.search(q, 10, 64).map(_._1).toSet
      (exact & approx).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean")
  }

  test("search results sorted ascending by distance") {
    val rnd = new java.util.Random(3)
    val vs = Array.fill(150)(Array.fill(8)(rnd.nextFloat()))
    val p = VamanaParams(maxDegree = 8, buildBeamWidth = 32, metric = "l2")
    val g = new VamanaGraph(flat(vs), 8, vs.length, p).build()
    val res = g.search(vs(3), 10, 32).map(_._2)
    assert(res.sameElements(res.sorted))
  }

  test("degree bounded by maxDegree after build") {
    val rnd = new java.util.Random(5)
    val vs = Array.fill(200)(Array.fill(8)(rnd.nextFloat()))
    val p = VamanaParams(maxDegree = 12, buildBeamWidth = 32, metric = "l2")
    val g = new VamanaGraph(flat(vs), 8, vs.length, p).build()
    assert(g.graph.forall(_.length <= 12))
  }

  test("hamming metric index over binary vectors (reference DistHamming analog)") {
    val rnd = new java.util.Random(21)
    val vs = Array.fill(200)(Array.fill(32)(if (rnd.nextBoolean()) 1f else 0f))
    val p = VamanaParams(maxDegree = 12, buildBeamWidth = 32, metric = "hamming")
    val g = new VamanaGraph(flat(vs), 32, vs.length, p).build()
    val recalls = (0 until 10).map { qi =>
      val q = vs(qi * 19 % vs.length)
      val exact = bruteKnn(vs, q, 5, Metric.Hamming).toSet
      val approx = g.search(q, 5, 32).map(_._1).toSet
      (exact & approx).size / 5.0
    }
    assert(recalls.sum / recalls.length >= 0.8)
    // self-query distance is 0
    assert(g.search(vs(0), 1, 16).head._2 == 0.0)
  }

  test("l1 and linf metric indexes: recall >= 0.8 vs their own brute force") {
    // closes the kernel side of the reference's distance genericity
    // (anndists DistL1/DistLinf) — the SQL expressions landed first
    val rnd = new java.util.Random(33)
    val vs = Array.fill(250)(Array.fill(16)(rnd.nextFloat() - 0.5f))
    for (m <- Seq(Metric.L1, Metric.Linf)) {
      val p = VamanaParams(maxDegree = 16, buildBeamWidth = 48, metric = m.name)
      val g = new VamanaGraph(flat(vs), 16, vs.length, p).build()
      val recalls = (0 until 10).map { qi =>
        val q = vs(qi * 23 % vs.length)
        val exact = bruteKnn(vs, q, 5, m).toSet
        val approx = g.search(q, 5, 48).map(_._1).toSet
        (exact & approx).size / 5.0
      }
      assert(recalls.sum / recalls.length >= 0.8, s"${m.name} recall low")
      assert(g.search(vs(3), 1, 16).head._1 == 3, s"${m.name} self-search")
    }
  }

  test("single-node and tiny shards don't crash") {
    val p = VamanaParams(maxDegree = 4, buildBeamWidth = 8, metric = "l2")
    val g1 = new VamanaGraph(Array(1f, 2f), 2, 1, p).build()
    assert(g1.search(Array(0f, 0f), 1, 4).map(_._1).sameElements(Array(0)))
    val g3 = new VamanaGraph(Array(0f, 0f, 1f, 0f, 0f, 1f), 2, 3, p).build()
    assert(g3.search(Array(0.9f, 0f), 2, 4).head._1 == 1)
  }
}

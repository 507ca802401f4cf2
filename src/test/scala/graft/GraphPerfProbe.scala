package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{VamanaGraph, VamanaParams}

/** Perf probe (not a correctness gate): times a single-shard build at
  * the bench shard size so kernel regressions are visible in CI logs. */
class GraphPerfProbe extends AnyFunSuite {
  test("single-shard build timing at bench size (500 nodes, dim 64)") {
    val rnd = new java.util.Random(42)
    val n = 500; val dim = 64
    val flat = Array.fill(n * dim)(rnd.nextFloat() - 0.5f)
    val p = VamanaParams(maxDegree = 32, buildBeamWidth = 64, passes = 1, metric = "cosine")
    // warmup
    new VamanaGraph(flat, dim, n, p).build()
    val t0 = System.nanoTime()
    new VamanaGraph(flat, dim, n, p).build()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"build(500, d64, passes=1): $sec%.3f s")
    val t1 = System.nanoTime()
    new VamanaGraph(flat, dim, n, VamanaParams(maxDegree = 32, buildBeamWidth = 64, passes = 2, metric = "cosine")).build()
    info(f"build(500, d64, passes=2): ${(System.nanoTime() - t1) / 1e9}%.3f s")
    assert(sec < 30.0)
  }
}

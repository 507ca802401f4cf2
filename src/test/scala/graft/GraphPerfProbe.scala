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

  test("u8 mmap serving: integer path vs widened-float fallback bandwidth") {
    val spark = SparkSpecBase.spark
    // integral [1,255] content — same quantization as the u8 spec
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
      .selectExpr("vec_id",
        """transform(embedding,
          |  x -> CAST(CAST(round(greatest(least(x, 1.0F), -1.0F) * 127 + 128, 0) AS INT) AS FLOAT))
          |AS embedding""".stripMargin)
    val p8 = graft.index.VamanaParams(maxDegree = 16, buildBeamWidth = 32, metric = "l2")
    val idx = graft.index.VamanaIndex.build(vecs, p8, numShards = 1)
    val path = "/tmp/graft_u8_perf.idx"
    graft.index.SingleFileIndex.export(idx, p8, path, u8 = true)
    val mm = new graft.index.MmapIndex(path)
    try {
      val qInt = mm.vector(7)            // integral → native integer loop
      val qFrac = qInt.clone(); qFrac(0) += 0.5f // fractional → widened fallback
      val reps = 2000
      def time(q: Array[Float]): Double = {
        var i = 0
        while (i < 200) { mm.search(q, 10, 64); i += 1 } // warmup
        val t0 = System.nanoTime()
        i = 0
        while (i < reps) { mm.search(q, 10, 64); i += 1 }
        (System.nanoTime() - t0) / 1e9 / reps * 1e6
      }
      val usInt = time(qInt)
      val usFloat = time(qFrac)
      info(f"u8 mmap search: integer path $usInt%.1f µs/query, widened-float $usFloat%.1f µs/query (${usFloat / usInt}%.2fx)")
      // byte-resident heap serving vs widened f32 heap graph
      val (g8, _, _) = graft.index.SingleFileIndex.importLocalU8(path)
      val (gf, _, _) = graft.index.SingleFileIndex.importLocal(path)
      def timeHeap(search: Array[Float] => Unit, q: Array[Float]): Double = {
        var i = 0
        while (i < 200) { search(q); i += 1 }
        val t0 = System.nanoTime()
        i = 0
        while (i < reps) { search(q); i += 1 }
        (System.nanoTime() - t0) / 1e9 / reps * 1e6
      }
      val usHeap8 = timeHeap(q => g8.search(q, 10, 64), qInt)
      val usHeapF = timeHeap(q => gf.search(q, 10, 64), qInt)
      info(f"u8 heap search: byte-resident $usHeap8%.1f µs/query, widened-f32 $usHeapF%.1f µs/query (heap = 1/4 the bytes)")
      // same candidates either way (identical distances) — sanity
      assert(mm.search(qInt, 10, 64).map(_._1).toSeq ==
        mm.search(qInt.map(_ + 0f), 10, 64).map(_._1).toSeq)
    } finally mm.close()
  }

  test("two-tier PQ serving: resident state size and per-query timing vs exact mmap") {
    val spark = SparkSpecBase.spark
    import spark.implicits._
    val vecs = Tables.embeddings(spark, SparkSpecBase.sf001)
    val p = graft.index.VamanaParams(metric = "cosine")
    val idx = graft.index.VamanaIndex.build(vecs, p, numShards = 1)
    val path = "/tmp/graft_pq_perf.idx"
    graft.index.SingleFileIndex.export(idx, p, path)
    val mm = new graft.index.MmapIndex(path)
    try {
      val (cb, codes) = mm.buildPqState()
      // resident-state arithmetic the 100 TB design rests on: codes are
      // m bytes/vector vs dim·4 on disk
      val residentB = codes.length + cb.cents.length * 4
      val diskB = mm.n.toLong * mm.dim * 4
      info(f"resident PQ state ${residentB / 1024.0}%.1f KiB vs $diskB%d B of f32 vectors (${diskB.toDouble / codes.length}%.0fx)")
      val q = mm.vector(7)
      val reps = 2000
      def time(f: => Unit): Double = {
        var i = 0
        while (i < 200) { f; i += 1 }
        val t0 = System.nanoTime()
        i = 0
        while (i < reps) { f; i += 1 }
        (System.nanoTime() - t0) / 1e9 / reps * 1e6
      }
      val usExact = time(mm.search(q, 10, 64))
      val usPq = time(mm.searchPq(q, 10, 64, cb, codes))
      info(f"mmap serving: exact $usExact%.1f µs/query, PQ-steered $usPq%.1f µs/query")
      assert(usPq < 10000, "PQ-steered search unreasonably slow")
    } finally mm.close()
  }
}

package graft.index

import java.util.{Arrays => JArrays}
import scala.collection.mutable.ArrayBuffer

/** Distance metric over flat float vectors, computed in double —
  * mirrors [[graft.functions.VectorExprs]] so graph-build distances and
  * query-side distances agree bit-for-bit. */
sealed trait Metric extends Serializable {
  def name: String
  def eval(a: Array[Float], aOff: Int, b: Array[Float], bOff: Int, dim: Int): Double
}
object Metric {
  case object L2 extends Metric {
    val name = "l2"
    def eval(a: Array[Float], ao: Int, b: Array[Float], bo: Int, dim: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { val d = a(ao + i).toDouble - b(bo + i).toDouble; acc += d * d; i += 1 }
      math.sqrt(acc)
    }
  }
  case object Cosine extends Metric {
    val name = "cosine"
    def eval(a: Array[Float], ao: Int, b: Array[Float], bo: Int, dim: Int): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < dim) {
        val x = a(ao + i).toDouble; val y = b(bo + i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      1.0 - dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }
  case object Dot extends Metric {
    val name = "dot"
    def eval(a: Array[Float], ao: Int, b: Array[Float], bo: Int, dim: Int): Double = {
      var dot = 0.0; var i = 0
      while (i < dim) { dot += a(ao + i).toDouble * b(bo + i).toDouble; i += 1 }
      -dot
    }
  }
  /** Hamming over binarized vectors (element ≠ element count) — the
    * unpacked form of the reference's `DistHamming` over packed u64
    * words (reference lib.rs:22-29): identical distances, bit-per-slot
    * layout instead of 64-bits-per-word. */
  case object Hamming extends Metric {
    val name = "hamming"
    def eval(a: Array[Float], ao: Int, b: Array[Float], bo: Int, dim: Int): Double = {
      var c = 0; var i = 0
      while (i < dim) { if (a(ao + i) != b(bo + i)) c += 1; i += 1 }
      c.toDouble
    }
  }
  def byName(n: String): Metric = n match {
    case "l2" => L2; case "cosine" => Cosine; case "dot" => Dot
    case "hamming" => Hamming
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }
}

/** Vamana build parameters — same knob set as the reference's
  * `DiskAnnParams` (reference lib.rs:86-107) plus an explicit seed so
  * every "random" choice is reproducible (SURVEY.md §5). */
case class VamanaParams(
    maxDegree: Int = 32,
    buildBeamWidth: Int = 64,
    alpha: Double = 1.2,
    passes: Int = 2,
    extraSeeds: Int = 1,
    seed: Long = 42L,
    metric: String = "cosine") {
  /** Reverse-list slack before re-prune (reference lib.rs:62-65). */
  def slackLimit: Int = math.max(maxDegree, math.ceil(1.3 * maxDegree).toInt)
}

/** Single-shard in-memory Vamana graph: build + beam search kernel.
  *
  * This is the per-partition compute that runs inside `mapPartitions`
  * in [[VamanaIndex]] — the one place the engine is deliberately
  * imperative, because graph construction is a pointer-chasing local
  * algorithm (same reason the reference is a native library). Each
  * Spark partition holds one shard; shards build independently and in
  * parallel across executors, so the build scales out linearly with
  * shard count.
  *
  * Algorithm (same family as reference lib.rs:971-1133, re-derived
  * from the Vamana/DiskANN paper, not translated):
  *  1. seeded random R-regular bootstrap (ref lib.rs:989-1004)
  *  2. `passes` refinement sweeps in seeded-shuffled order; pass 0 of a
  *     multi-pass build uses α=1.0, later passes the target α
  *     (ref lib.rs:1013-1020)
  *  3. per node: greedy beam search from the medoid (+ extraSeeds
  *     deterministic restarts) collecting all visited candidates
  *     (ref lib.rs:1140-1198), then robust α-prune with nearest
  *     backfill (ref lib.rs:1201-1279)
  *  4. reverse edges merged; lists over `slackLimit` are re-pruned
  *     (ref lib.rs:784-914)
  *
  * All randomness is splitmix64 streams keyed by (seed, node) so two
  * builds of the same shard are identical.
  */
final class VamanaGraph(
    val vecs: Array[Float], // n × dim, row-major
    val dim: Int,
    val n: Int,
    val params: VamanaParams) extends Serializable {

  private val metric: Metric = Metric.byName(params.metric)
  @inline private def dist(i: Int, j: Int): Double =
    metric.eval(vecs, i * dim, vecs, j * dim, dim)
  @inline private def distQ(q: Array[Float], j: Int): Double =
    metric.eval(q, 0, vecs, j * dim, dim)

  /** splitmix64 — tiny, public-domain PRNG recurrence. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rngInt(state: Long, bound: Int): Int =
    (Math.floorMod(mix(state), bound.toLong)).toInt

  /** adjacency: var-degree lists, bounded by slackLimit during build. */
  val graph: Array[Array[Int]] = new Array[Array[Int]](n)

  /** Entry point: medoid over min(n, 64) deterministic pivots (ids
    * 0, step, 2·step …) — sampled form of reference lib.rs:736-756. */
  lazy val medoid: Int = {
    if (n == 1) 0
    else {
      val np = math.min(64, n)
      val step = math.max(1, n / np)
      val pivots = (0 until np).map(_ * step % n).distinct.toArray
      var best = 0; var bestScore = Double.MaxValue
      var i = 0
      while (i < n) {
        var s = 0.0; var p = 0
        while (p < pivots.length) { s += dist(i, pivots(p)); p += 1 }
        if (s < bestScore) { bestScore = s; best = i }
        i += 1
      }
      best
    }
  }

  // ---------------------------------------------------------------- search

  /** Greedy best-first beam search; returns visited (ids, dists) for
    * build, and the final working set for serving. */
  private final class SearchScratch {
    val mark = new Array[Int](n)
    var epoch = 0
    // frontier + working set as insertion-sorted arrays (descending
    // dist at index 0), cheap for beam ≤ a few hundred.
    var workIds = new Array[Int](0)
    var workDists = new Array[Double](0)
    val visitedIds = new ArrayBuffer[Int]()
    val visitedDists = new ArrayBuffer[Double]()
  }

  private def beamSearchInternal(
      q: Array[Float], qIdx: Int, entry: Int, beamWidth: Int,
      scratch: SearchScratch, collectVisited: Boolean): (Array[Int], Array[Double]) = {
    import scratch._
    epoch += 1
    visitedIds.clear(); visitedDists.clear()

    // working set: parallel arrays sorted ascending by (dist, id), capped
    val wIds = new Array[Int](beamWidth)
    val wDists = new Array[Double](beamWidth)
    var wLen = 0
    // frontier: ascending sorted stack of unexpanded candidates
    val fIds = new ArrayBuffer[Int]()
    val fDists = new ArrayBuffer[Double]()

    @inline def worst: Double = if (wLen == 0) Double.MaxValue else wDists(wLen - 1)

    def wInsert(id: Int, d: Double): Boolean = {
      if (wLen == beamWidth && (d > worst || (d == worst && id > wIds(wLen - 1)))) return false
      var lo = 0; var hi = wLen
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (wDists(mid) < d || (wDists(mid) == d && wIds(mid) < id)) lo = mid + 1 else hi = mid
      }
      val newLen = math.min(wLen + 1, beamWidth)
      var i = newLen - 1
      while (i > lo) { wIds(i) = wIds(i - 1); wDists(i) = wDists(i - 1); i -= 1 }
      if (lo < beamWidth) { wIds(lo) = id; wDists(lo) = d }
      wLen = newLen
      true
    }

    def fPush(id: Int, d: Double): Unit = {
      // keep ascending; pop from end is best? store descending so best at end
      var lo = 0; var hi = fIds.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (fDists(mid) > d) lo = mid + 1 else hi = mid
      }
      fIds.insert(lo, id); fDists.insert(lo, d)
    }

    def visit(id: Int, d: Double): Unit = {
      mark(id) = epoch
      if (collectVisited) { visitedIds += id; visitedDists += d }
    }

    val d0 = if (qIdx >= 0) dist(qIdx, entry) else distQ(q, entry)
    visit(entry, d0); wInsert(entry, d0); fPush(entry, d0)

    while (fIds.nonEmpty) {
      val last = fIds.length - 1
      val bestD = fDists(last)
      if (wLen >= beamWidth && bestD >= worst) {
        fIds.clear(); fDists.clear()
      } else {
        val cur = fIds(last)
        fIds.remove(last); fDists.remove(last)
        val nbrs = graph(cur)
        if (nbrs != null) {
          var t = 0
          while (t < nbrs.length) {
            val nb = nbrs(t)
            if (mark(nb) != epoch) {
              val d = if (qIdx >= 0) dist(qIdx, nb) else distQ(q, nb)
              visit(nb, d)
              if (wLen < beamWidth || d < worst || (d == worst && nb < wIds(wLen - 1))) {
                wInsert(nb, d); fPush(nb, d)
              }
            }
            t += 1
          }
        }
      }
    }
    (JArrays.copyOf(wIds, wLen), JArrays.copyOf(wDists, wLen))
  }

  /** Serving-path search: top-k (local idx, dist) for an external query
    * vector (reference lib.rs:635-701). */
  def search(q: Array[Float], k: Int, beamWidth: Int): Array[(Int, Double)] = {
    val scratch = new SearchScratch
    val (ids, dists) = beamSearchInternal(q, -1, medoid, math.max(beamWidth, k), scratch, collectVisited = false)
    ids.zip(dists).take(k)
  }

  // ---------------------------------------------------------------- build

  /** Robust α-prune with nearest backfill (ref lib.rs:1201-1279).
    * `candIds/candDists` must be sorted ascending by (dist, id) and
    * deduped, self excluded. */
  private def pruneWith(u: Int, candIds: Array[Int], candDists: Array[Double], alpha: Double): Array[Int] = {
    val maxDeg = params.maxDegree
    val out = new ArrayBuffer[Int](maxDeg)
    var i = 0
    while (i < candIds.length && out.length < maxDeg) {
      val c = candIds(i); val dc = candDists(i)
      var occluded = false
      var s = 0
      while (s < out.length && !occluded) {
        if (alpha * dist(c, out(s)) <= dc) occluded = true
        s += 1
      }
      if (!occluded) out += c
      i += 1
    }
    if (out.length < maxDeg) {
      i = 0
      while (i < candIds.length && out.length < maxDeg) {
        val c = candIds(i)
        if (!out.contains(c)) out += c
        i += 1
      }
    }
    out.toArray
  }

  private def sortDedupCandidates(u: Int, ids: ArrayBuffer[Int], dists: ArrayBuffer[Double]): (Array[Int], Array[Double]) = {
    val m = ids.length
    val idx = (0 until m).toArray.filter(t => ids(t) != u)
    val sorted = idx.sortBy(t => (dists(t), ids(t)))
    val outI = new ArrayBuffer[Int](sorted.length)
    val outD = new ArrayBuffer[Double](sorted.length)
    var last = -1
    val seen = new java.util.HashSet[Integer]()
    var t = 0
    while (t < sorted.length) {
      val id = ids(sorted(t))
      if (!seen.contains(id)) { seen.add(id); outI += id; outD += dists(sorted(t)) }
      t += 1
    }
    (outI.toArray, outD.toArray)
  }

  def build(): VamanaGraph = {
    if (n == 1) { graph(0) = Array.empty; return this }
    val maxDeg = math.min(params.maxDegree, n - 1)
    val slack = params.slackLimit

    // 1. seeded random bootstrap (ref lib.rs:989-1004)
    var u = 0
    while (u < n) {
      val s = new java.util.HashSet[Integer]()
      var tries = 0L
      while (s.size < maxDeg && tries < maxDeg * 8L) {
        val nb = rngInt(params.seed ^ (u.toLong << 20) ^ tries, n)
        if (nb != u) s.add(nb)
        tries += 1
      }
      val arr = new Array[Int](s.size)
      val it = s.iterator(); var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      JArrays.sort(arr)
      graph(u) = arr
      u += 1
    }

    val scratch = new SearchScratch
    val chunkSize = 256
    val passes = math.max(1, params.passes)

    var pass = 0
    while (pass < passes) {
      val passAlpha =
        if (passes == 1) params.alpha else if (pass == 0) 1.0 else params.alpha

      // seeded shuffle of processing order (ref lib.rs:1022-1023)
      val order = (0 until n).toArray
      var i = n - 1
      while (i > 0) {
        val j = rngInt(params.seed ^ 0x5eedL ^ (pass.toLong << 32) ^ i.toLong, i + 1)
        val tmp = order(i); order(i) = order(j); order(j) = tmp
        i -= 1
      }

      var cs = 0
      while (cs < n) {
        val ce = math.min(cs + chunkSize, n)
        val newLists = new Array[Array[Int]](ce - cs)
        var ci = cs
        while (ci < ce) {
          val node = order(ci)
          val candIds = new ArrayBuffer[Int]()
          val candDists = new ArrayBuffer[Double]()
          val cur = graph(node)
          var t = 0
          while (t < cur.length) { candIds += cur(t); candDists += dist(node, cur(t)); t += 1 }
          // greedy from medoid + deterministic extra seeds
          var si = 0
          while (si <= params.extraSeeds) {
            val entry =
              if (si == 0) medoid
              else rngInt(params.seed ^ 0xabcdL ^ (node.toLong << 8) ^ (pass.toLong << 40) ^ si.toLong, n)
            val (_, _) = beamSearchInternal(null, node, entry, params.buildBeamWidth, scratch, collectVisited = true)
            var v = 0
            while (v < scratch.visitedIds.length) {
              candIds += scratch.visitedIds(v); candDists += scratch.visitedDists(v); v += 1
            }
            si += 1
          }
          val (sIds, sDists) = sortDedupCandidates(node, candIds, candDists)
          newLists(ci - cs) = pruneWith(node, sIds, sDists, passAlpha)
          ci += 1
        }
        // merge chunk: commit outgoing, add reverse edges, slack re-prune
        // (ref lib.rs:784-914)
        ci = cs
        while (ci < ce) { graph(order(ci)) = newLists(ci - cs); ci += 1 }
        ci = cs
        while (ci < ce) {
          val src = order(ci)
          val outs = newLists(ci - cs)
          var t = 0
          while (t < outs.length) {
            val dst = outs(t)
            val cur = graph(dst)
            if (!cur.contains(src)) {
              val merged = JArrays.copyOf(cur, cur.length + 1)
              merged(cur.length) = src
              graph(dst) =
                if (merged.length <= slack) merged
                else {
                  val ids = new ArrayBuffer[Int](merged.length)
                  val ds = new ArrayBuffer[Double](merged.length)
                  var x = 0
                  while (x < merged.length) { ids += merged(x); ds += dist(dst, merged(x)); x += 1 }
                  val (si2, sd2) = sortDedupCandidates(dst, ids, ds)
                  pruneWith(dst, si2, sd2, passAlpha)
                }
            }
            t += 1
          }
          ci += 1
        }
        cs = ce
      }
      pass += 1
    }

    // final cleanup: enforce max degree (ref lib.rs:1111-1132)
    u = 0
    while (u < n) {
      if (graph(u).length > maxDeg) {
        val ids = new ArrayBuffer[Int](graph(u).length)
        val ds = new ArrayBuffer[Double](graph(u).length)
        var t = 0
        while (t < graph(u).length) { ids += graph(u)(t); ds += dist(u, graph(u)(t)); t += 1 }
        val (si2, sd2) = sortDedupCandidates(u, ids, ds)
        graph(u) = pruneWith(u, si2, sd2, params.alpha)
      }
      u += 1
    }
    this
  }
}

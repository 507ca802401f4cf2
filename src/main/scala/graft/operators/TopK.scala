package graft.operators

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** A (neighbor id, distance) candidate. */
case class KnnCand(id: Long, dist: Double)

/** Top-k buffer: parallel arrays kept sorted ascending by (dist, id),
  * capped at k. Encodable as a plain product so it shuffles compactly. */
case class TopKBuf(ids: Array[Long], dists: Array[Double])

/** Bounded top-k aggregator with map-side partial aggregation.
  *
  * This is the scale-critical piece of every kNN/search operator: the
  * shuffle carries at most k (id, dist) pairs per (group, partition)
  * instead of the full candidate set. At 100 TB a brute-force scan
  * produces |corpus| candidates per query; with this aggregator each
  * of the P input partitions contributes ≤ k rows to the exchange, so
  * the reduce side sees P·k rows per query, independent of corpus
  * size. Mirrors the reference's bounded working set in its beam
  * search (reference lib.rs:646, `w: BinaryHeap<Candidate>` capped at
  * beam_width) — re-expressed as a Spark partial aggregate.
  *
  * Ties break on id, so results are engine-reproducible.
  */
class TopKAgg(k: Int) extends Aggregator[KnnCand, TopKBuf, TopKBuf] {

  override def zero: TopKBuf = TopKBuf(Array.emptyLongArray, Array.emptyDoubleArray)

  // NaN-total ordering (Double.compare sorts NaN last, like the SQL
  // ORDER BY both engines use) — raw < / == would let a NaN candidate
  // slip to rank 1 because every NaN comparison is false
  private def better(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && i1 < i2)
  }

  override def reduce(b: TopKBuf, a: KnnCand): TopKBuf = {
    val n = b.ids.length
    if (n >= k && !better(a.dist, a.id, b.dists(n - 1), b.ids(n - 1))) return b
    // binary search for insertion point by (dist, id)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(b.dists(mid), b.ids(mid), a.dist, a.id)) lo = mid + 1 else hi = mid
    }
    val outN = math.min(n + 1, k)
    val ids = new Array[Long](outN)
    val dists = new Array[Double](outN)
    System.arraycopy(b.ids, 0, ids, 0, lo)
    System.arraycopy(b.dists, 0, dists, 0, lo)
    ids(lo) = a.id; dists(lo) = a.dist
    val tail = outN - lo - 1
    if (tail > 0) {
      System.arraycopy(b.ids, lo, ids, lo + 1, tail)
      System.arraycopy(b.dists, lo, dists, lo + 1, tail)
    }
    TopKBuf(ids, dists)
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    val n1 = b1.ids.length; val n2 = b2.ids.length
    val outN = math.min(n1 + n2, k)
    val ids = new Array[Long](outN)
    val dists = new Array[Double](outN)
    var i = 0; var j = 0; var o = 0
    while (o < outN) {
      val takeLeft = j >= n2 ||
        (i < n1 && better(b1.dists(i), b1.ids(i), b2.dists(j), b2.ids(j)))
      if (takeLeft) { ids(o) = b1.ids(i); dists(o) = b1.dists(i); i += 1 }
      else { ids(o) = b2.ids(j); dists(o) = b2.dists(j); j += 1 }
      o += 1
    }
    TopKBuf(ids, dists)
  }

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder = Encoders.product[TopKBuf]
  override def outputEncoder = Encoders.product[TopKBuf]
}

object TopK {
  /** Untyped column form: `topk(k)(col("id"), col("dist"))` aggregates to
    * a struct(ids: array<long>, dists: array<double>) sorted ascending. */
  def topk(k: Int): (Column, Column) => Column = {
    val u = functions.udaf(new TopKAgg(k), Encoders.product[KnnCand])
    (id: Column, dist: Column) => u(id, dist)
  }
}

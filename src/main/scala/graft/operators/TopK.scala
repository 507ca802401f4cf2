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
  *
  * `distinctIds = true` additionally keeps at most one entry per id
  * (the best), for candidate streams where the same neighbor can
  * legitimately arrive more than once — an overlapped sharded index
  * returns a replicated vector from each shard that holds it. Doing
  * the dedup inside the aggregate costs zero extra shuffle: map-side
  * partials collapse same-partition duplicates and the reduce-side
  * merge collapses cross-shard ones, vs. a groupBy(q_id, nid)
  * pre-aggregation that would add a corpus-of-candidates exchange.
  */
class TopKAgg(k: Int, distinctIds: Boolean = false)
    extends Aggregator[KnnCand, TopKBuf, TopKBuf] {

  // fail at construction, not as an AIOOBE(-1) inside an executor's
  // reduce when a computed k collapses to 0
  require(k >= 1, s"top-k needs k >= 1, got $k")

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
    // O(1) reject FIRST, before any distinct-id scan: with a full
    // buffer, a candidate not better than the last entry is a no-op
    // even in distinct mode — if its id is resident, the resident
    // pair is necessarily at least as good. The common path at
    // |candidates| >> k pays no linear scan.
    if (n >= k && !better(a.dist, a.id, b.dists(n - 1), b.ids(n - 1))) return b
    if (distinctIds) {
      // buffers are ≤ k entries, so a linear id scan is cheaper than
      // any auxiliary structure that would have to shuffle with it
      var p = 0
      while (p < n) {
        if (b.ids(p) == a.id) {
          // duplicates carry bit-identical dists in the overlap use;
          // handle the general case anyway: keep the better pair
          return if (!better(a.dist, a.id, b.dists(p), b.ids(p))) b
          else reduce(removeAt(b, p), a)
        }
        p += 1
      }
    }
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

  private def removeAt(b: TopKBuf, p: Int): TopKBuf = {
    val n = b.ids.length
    val ids = new Array[Long](n - 1); val dists = new Array[Double](n - 1)
    System.arraycopy(b.ids, 0, ids, 0, p)
    System.arraycopy(b.dists, 0, dists, 0, p)
    System.arraycopy(b.ids, p + 1, ids, p, n - p - 1)
    System.arraycopy(b.dists, p + 1, dists, p, n - p - 1)
    TopKBuf(ids, dists)
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    val n1 = b1.ids.length; val n2 = b2.ids.length
    val cap = math.min(n1 + n2, k)
    val ids = new Array[Long](cap)
    val dists = new Array[Double](cap)
    var i = 0; var j = 0; var o = 0
    while (o < cap && (i < n1 || j < n2)) {
      val takeLeft = j >= n2 ||
        (i < n1 && better(b1.dists(i), b1.ids(i), b2.dists(j), b2.ids(j)))
      val id = if (takeLeft) b1.ids(i) else b2.ids(j)
      val d = if (takeLeft) b1.dists(i) else b2.dists(j)
      if (takeLeft) i += 1 else j += 1
      // merged stream is (dist, id)-ascending, so the first occurrence
      // of an id is its best pair — later duplicates are just skipped
      var dup = false
      if (distinctIds) {
        var p = 0
        while (p < o && !dup) { dup = ids(p) == id; p += 1 }
      }
      if (!dup) { ids(o) = id; dists(o) = d; o += 1 }
    }
    if (o == cap) TopKBuf(ids, dists)
    else TopKBuf(ids.take(o), dists.take(o))
  }

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder = Encoders.product[TopKBuf]
  override def outputEncoder = Encoders.product[TopKBuf]
}

/** A scored term candidate for per-group top-k term selection —
  * (word, tf, df) is the payload, ordering is (score DESC, word ASC). */
case class TermCand(word: String, tf: Long, df: Long, score: Double)

/** Top-k term buffer: parallel arrays kept sorted by (score DESC,
  * word ASC), capped at k. */
case class TermTopKBuf(
    words: Array[String], tfs: Array[Long], dfs: Array[Long],
    scores: Array[Double])

/** Bounded top-k-terms aggregator — the [[TopKAgg]] shape with a
  * (score DESC, word ASC) ordering and a carried (tf, df) payload.
  *
  * Replaces the rank-window form of per-source term selection: a
  * window must shuffle and SORT the full vocab-sized input per
  * source, while this partial aggregate carries at most k terms per
  * (source, partition) into the exchange — k·partitions rows instead
  * of the vocabulary, independent of corpus size. The same
  * allocation-pressure argument as TopKAgg: at 100 TB the vocab
  * window is a full-vocabulary shuffle; this is not. */
class TermTopKAgg(k: Int) extends Aggregator[TermCand, TermTopKBuf, TermTopKBuf] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def zero: TermTopKBuf = TermTopKBuf(
    Array.empty[String], Array.emptyLongArray, Array.emptyLongArray,
    Array.emptyDoubleArray)

  // score DESC then word ASC; Double.compare gives NaN a total order
  // (sorted last under DESC) like the SQL ORDER BY both engines use.
  // Word ties break in CODE-POINT order, not JVM UTF-16 unit order —
  // Spark SQL ORDER BY and DuckDB both sort by UTF-8 binary order,
  // which diverges from String '<' for supplementary-plane words
  // (the very divergence SharedHash.codePointCompare exists for)
  private def better(s1: Double, w1: String, s2: Double, w2: String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && graft.functions.SharedHash.codePointCompare(w1, w2) < 0)
  }

  override def reduce(b: TermTopKBuf, a: TermCand): TermTopKBuf = {
    val n = b.words.length
    if (n >= k && !better(a.score, a.word, b.scores(n - 1), b.words(n - 1))) return b
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(b.scores(mid), b.words(mid), a.score, a.word)) lo = mid + 1 else hi = mid
    }
    val outN = math.min(n + 1, k)
    val words = new Array[String](outN); val tfs = new Array[Long](outN)
    val dfs = new Array[Long](outN); val scores = new Array[Double](outN)
    System.arraycopy(b.words, 0, words, 0, lo)
    System.arraycopy(b.tfs, 0, tfs, 0, lo)
    System.arraycopy(b.dfs, 0, dfs, 0, lo)
    System.arraycopy(b.scores, 0, scores, 0, lo)
    words(lo) = a.word; tfs(lo) = a.tf; dfs(lo) = a.df; scores(lo) = a.score
    val tail = outN - lo - 1
    if (tail > 0) {
      System.arraycopy(b.words, lo, words, lo + 1, tail)
      System.arraycopy(b.tfs, lo, tfs, lo + 1, tail)
      System.arraycopy(b.dfs, lo, dfs, lo + 1, tail)
      System.arraycopy(b.scores, lo, scores, lo + 1, tail)
    }
    TermTopKBuf(words, tfs, dfs, scores)
  }

  override def merge(b1: TermTopKBuf, b2: TermTopKBuf): TermTopKBuf = {
    val n1 = b1.words.length; val n2 = b2.words.length
    val cap = math.min(n1 + n2, k)
    val words = new Array[String](cap); val tfs = new Array[Long](cap)
    val dfs = new Array[Long](cap); val scores = new Array[Double](cap)
    var i = 0; var j = 0; var o = 0
    while (o < cap) {
      val takeLeft = j >= n2 ||
        (i < n1 && better(b1.scores(i), b1.words(i), b2.scores(j), b2.words(j)))
      if (takeLeft) {
        words(o) = b1.words(i); tfs(o) = b1.tfs(i); dfs(o) = b1.dfs(i)
        scores(o) = b1.scores(i); i += 1
      } else {
        words(o) = b2.words(j); tfs(o) = b2.tfs(j); dfs(o) = b2.dfs(j)
        scores(o) = b2.scores(j); j += 1
      }
      o += 1
    }
    TermTopKBuf(words, tfs, dfs, scores)
  }

  override def finish(b: TermTopKBuf): TermTopKBuf = b

  override def bufferEncoder = Encoders.product[TermTopKBuf]
  override def outputEncoder = Encoders.product[TermTopKBuf]
}

/** A row candidate for per-group FIRST-k selection under a composite
  * (ts, ok, ln) ascending key — the row_number()-window ordering of
  * q_window — with a numeric payload riding along. (ok, ln) is a
  * primary key upstream, so the ordering is total and tie-free. */
case class FirstKCand(ts: Long, ok: Long, ln: Int, price: Double)

/** First-k buffer: parallel arrays kept sorted ascending by
  * (ts, ok, ln), capped at k. */
case class FirstKBuf(
    tss: Array[Long], oks: Array[Long], lns: Array[Int],
    prices: Array[Double])

/** First-k output: the kept rows in rank order plus the running
  * payload prefix sums (accumulated left-to-right, exactly the order
  * a running-sum window frame adds them). */
case class FirstKOut(oks: Array[Long], lns: Array[Int], runs: Array[Double])

/** Bounded first-k-rows aggregator — the [[TopKAgg]] shape for a
  * `row_number() <= k` window filter over a composite ascending key.
  *
  * Replaces the rank-window form: even with Spark's WindowGroupLimit
  * pushdown the map side must SORT its whole scan partition before
  * the partial group limit can run, which at 100 TB means a full
  * per-task sort (and its spill risk) of every input partition. This
  * aggregate keeps at most k rows per (group, partition) in a bounded
  * buffer instead — O(n·log k) per task, O(groups·k) memory, and the
  * exchange carries one ≤k-row buffer per (group, partition). */
class FirstKAgg(k: Int) extends Aggregator[FirstKCand, FirstKBuf, FirstKOut] {

  require(k >= 1, s"first-k needs k >= 1, got $k")

  override def zero: FirstKBuf = FirstKBuf(
    Array.emptyLongArray, Array.emptyLongArray, Array.emptyIntArray,
    Array.emptyDoubleArray)

  // strict lexicographic (ts, ok, ln) ascending
  private def before(t1: Long, o1: Long, l1: Int,
      t2: Long, o2: Long, l2: Int): Boolean =
    t1 < t2 || (t1 == t2 && (o1 < o2 || (o1 == o2 && l1 < l2)))

  override def reduce(b: FirstKBuf, a: FirstKCand): FirstKBuf = {
    val n = b.oks.length
    if (n >= k && !before(a.ts, a.ok, a.ln,
        b.tss(n - 1), b.oks(n - 1), b.lns(n - 1))) return b
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(b.tss(mid), b.oks(mid), b.lns(mid), a.ts, a.ok, a.ln))
        lo = mid + 1
      else hi = mid
    }
    val outN = math.min(n + 1, k)
    val tss = new Array[Long](outN); val oks = new Array[Long](outN)
    val lns = new Array[Int](outN); val prices = new Array[Double](outN)
    System.arraycopy(b.tss, 0, tss, 0, lo)
    System.arraycopy(b.oks, 0, oks, 0, lo)
    System.arraycopy(b.lns, 0, lns, 0, lo)
    System.arraycopy(b.prices, 0, prices, 0, lo)
    tss(lo) = a.ts; oks(lo) = a.ok; lns(lo) = a.ln; prices(lo) = a.price
    val tail = outN - lo - 1
    if (tail > 0) {
      System.arraycopy(b.tss, lo, tss, lo + 1, tail)
      System.arraycopy(b.oks, lo, oks, lo + 1, tail)
      System.arraycopy(b.lns, lo, lns, lo + 1, tail)
      System.arraycopy(b.prices, lo, prices, lo + 1, tail)
    }
    FirstKBuf(tss, oks, lns, prices)
  }

  override def merge(b1: FirstKBuf, b2: FirstKBuf): FirstKBuf = {
    val n1 = b1.oks.length; val n2 = b2.oks.length
    val cap = math.min(n1 + n2, k)
    val tss = new Array[Long](cap); val oks = new Array[Long](cap)
    val lns = new Array[Int](cap); val prices = new Array[Double](cap)
    var i = 0; var j = 0; var o = 0
    while (o < cap) {
      val takeLeft = j >= n2 || (i < n1 &&
        before(b1.tss(i), b1.oks(i), b1.lns(i), b2.tss(j), b2.oks(j), b2.lns(j)))
      if (takeLeft) {
        tss(o) = b1.tss(i); oks(o) = b1.oks(i); lns(o) = b1.lns(i)
        prices(o) = b1.prices(i); i += 1
      } else {
        tss(o) = b2.tss(j); oks(o) = b2.oks(j); lns(o) = b2.lns(j)
        prices(o) = b2.prices(j); j += 1
      }
      o += 1
    }
    FirstKBuf(tss, oks, lns, prices)
  }

  override def finish(b: FirstKBuf): FirstKOut = {
    val n = b.oks.length
    val runs = new Array[Double](n)
    var acc = 0.0; var i = 0
    while (i < n) { acc += b.prices(i); runs(i) = acc; i += 1 }
    FirstKOut(b.oks, b.lns, runs)
  }

  override def bufferEncoder = Encoders.product[FirstKBuf]
  override def outputEncoder = Encoders.product[FirstKOut]
}

object TopK {
  /** Untyped column form: `topk(k)(col("id"), col("dist"))` aggregates to
    * a struct(ids: array<long>, dists: array<double>) sorted ascending. */
  def topk(k: Int): (Column, Column) => Column = {
    val u = functions.udaf(new TopKAgg(k), Encoders.product[KnnCand])
    (id: Column, dist: Column) => u(id, dist)
  }

  /** Id-distinct variant — for overlapped/replicated candidate streams. */
  def topkDistinct(k: Int): (Column, Column) => Column = {
    val u = functions.udaf(new TopKAgg(k, distinctIds = true), Encoders.product[KnnCand])
    (id: Column, dist: Column) => u(id, dist)
  }

  /** Per-group top-k terms by (score DESC, word ASC):
    * `termTopk(k)(word, tf, df, score)` aggregates to a
    * struct(words, tfs, dfs, scores) of parallel arrays in rank
    * order. */
  def termTopk(k: Int): (Column, Column, Column, Column) => Column = {
    val u = functions.udaf(new TermTopKAgg(k), Encoders.product[TermCand])
    (word: Column, tf: Column, df: Column, score: Column) => u(word, tf, df, score)
  }

  /** Per-group first-k rows by (ts, ok, ln) ASC with a running prefix
    * sum of the payload: `firstK(k)(ts, ok, ln, price)` aggregates to
    * a struct(oks, lns, runs) of parallel arrays in rank order. */
  def firstK(k: Int): (Column, Column, Column, Column) => Column = {
    val u = functions.udaf(new FirstKAgg(k), Encoders.product[FirstKCand])
    (ts: Column, ok: Column, ln: Column, price: Column) => u(ts, ok, ln, price)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The oracle gate proves Spark==DuckDB; this spec proves the
  * detectors actually CATCH near-duplicates: a corpus with one planted
  * near-dup pair (one word changed out of 60) and one unrelated doc
  * must yield exactly the planted pair from every detector. */
class DedupSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = "/tmp/graft_dedup_sem"
    val words = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = words.replace("word30", "changed")
    val other = (1 to 60).map(i => s"zz$i").mkString(" ")
    val docs = Seq(
      (1L, words, "en", "srcA", words.length.toLong),
      (2L, nearDup, "en", "srcA", nearDup.length.toLong),
      (3L, other, "en", "srcA", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("minhash finds the planted near-dup pair with high jaccard") {
    val rows = operators.Dedup.qDedupMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.8 },
      rows.toSeq.toString)
    assert(!rows.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("simhash flags the planted pair within hamming 3 and not the unrelated doc") {
    val rows = operators.Dedup.qDedupSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.exists { case (a, b, h) => a == 1L && b == 2L && h <= 3 },
      rows.toSeq.toString)
    assert(!rows.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("char-3-gram jaccard blocks and verifies the planted pair") {
    val rows = operators.Dedup.qDedupJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.exists { case (a, b, j) => a == 1L && b == 2L && j >= 0.6 },
      rows.toSeq.toString)
  }

  test("dedup clustering groups the planted pair under the min-id keeper") {
    val rows = operators.Dedup.qDedupCluster(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docs 1 and 2 are the planted near-dup pair → one 2-member
    // cluster labeled by the min id; the unrelated doc 3 pairs with
    // nothing and so never enters the pair graph
    assert(rows == Set((1L, 1L, 2L), (2L, 1L, 2L)), rows.toString)
  }

  test("skew guard: a pathological bucket is salted, work is bounded, pairs are complete") {
    // 300 members land in ONE block; with cap=20 the guard must split
    // it into salted tasks yet still offer every unordered pair once.
    val n = 300; val cap = 20; val maxSalts = 8
    val rows = spark.range(n)
      .select(lit("hot").as("block"), col("id"), (col("id") * 7L).as("payload"))
      .as[(String, Long, Long)]
    val pairs = operators.Dedup.saltedPairs(rows, cap, maxSalts) {
      case ((ida, pa), (idb, pb)) => Some((ida, idb, pa + pb))
    }.collect()
    assert(pairs.length == n * (n - 1) / 2, s"got ${pairs.length} pairs")
    assert(pairs.toSet.size == pairs.length, "pair emitted more than once")
    assert(pairs.forall { case (a, b, sum) => a < b && sum == 7 * (a + b) })
    // per-task membership is bounded: S=8 salts → ≤ 2·ceil(n/S) members
    val taskSizes = operators.Dedup.saltExplode(rows, cap, maxSalts)
      .groupByKey { case (block, ti, tj, _, _, _) => (block, ti, tj) }
      .mapGroups((_, it) => it.size)
      .collect()
    val bound = 2 * ((n + maxSalts - 1) / maxSalts)
    assert(taskSizes.max <= bound, s"max task ${taskSizes.max} > bound $bound")
    assert(taskSizes.length == maxSalts * (maxSalts + 1) / 2)
    // a small block must stay a single task
    val small = spark.range(5)
      .select(lit("cold").as("block"), col("id"), col("id").as("payload"))
      .as[(String, Long, Long)]
    val smallTasks = operators.Dedup.saltExplode(small, cap, maxSalts)
      .groupByKey { case (block, ti, tj, _, _, _) => (block, ti, tj) }
      .mapGroups((_, it) => it.size).collect()
    assert(smallTasks.sameElements(Array(5)))
  }

  test("exact dedup keeps the lower id of identical texts") {
    val d2 = "/tmp/graft_dedup_exact"
    Seq((5L, "same text", "en", "s", 9L), (9L, "same text", "en", "s", 9L),
      (7L, "unique", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = operators.Dedup.qDedupExact(spark, d2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((5L, 5L, 2L), (9L, 5L, 2L), (7L, 7L, 1L)))
  }

  test("exact dedup sizes mega-replica groups via the aggregate+join path") {
    // the r15 qDedupExact rides exactGroups (aggregate + join) instead
    // of min/count windows — a window would sort each whole md5 group
    // in one task. Pin the query ITSELF on the 300-doc skew corpus:
    // one 180-copy group, one 120-copy group, one singleton.
    val rows = operators.Dedup.qDedupExact(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 301)
    assert(rows.count { case (_, k, n) => k == 0L && n == 180L } == 180)
    assert(rows.count { case (_, k, n) => k == 1L && n == 120L } == 120)
    assert(rows.toSeq.contains((2000L, 2000L, 1L)))
    // ordered by doc_id per the oracle contract
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  /** Corpus exercising every path of the exact-collapse-first cluster
    * variant: verbatim copies of both sides of a near-dup pair
    * (quotient cross edges), an exact-only group with no near-dup
    * neighbor (self-linked component), verbatim copies of a <3-word
    * text (empty shingle set — must NOT cluster), and singletons. */
  private lazy val repDir: String = {
    val d = "/tmp/graft_dedup_rep"
    val words = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = words.replace("word30", "changed")
    val other = (1 to 60).map(i => s"zz$i").mkString(" ")
    val island = (1 to 60).map(i => s"qq$i").mkString(" ")
    val docs = Seq(
      (1L, words), (2L, nearDup), (3L, other),
      (4L, words), (5L, nearDup), // verbatim copies of the pair
      (6L, island), (7L, island), // exact-only group, no cross edges
      (8L, "a b"), (9L, "a b"),   // copies with an EMPTY shingle set
      (10L, (1 to 60).map(i => s"yy$i").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact-collapse-first clustering is byte-identical to the full-graph form") {
    val full = operators.Dedup.qDedupCluster(spark, repDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rep = operators.Dedup.qDedupClusterRep(spark, repDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the structure itself first, so a failure names the path:
    // {1,2,4,5} via quotient cross edges, {6,7} via self-link only,
    // 8/9 excluded (empty shingles), 3/10 singletons excluded
    assert(full.toSet == Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (4L, 1L, 4L), (5L, 1L, 4L),
      (6L, 6L, 2L), (7L, 6L, 2L)), full.toSeq.toString)
    assert(rep.toSeq == full.toSeq, "rep variant diverged from parent")
  }

  /** Replica-skew corpus: one md5 group of 180 verbatim copies + 120
    * copies of its near-dup (interleaved ids, so cross-group pairs
    * exercise the lower-id-first re-ordering) + one unrelated doc —
    * the regime every exact-collapse-first form exists for. */
  private lazy val skewDir: String = {
    val d = "/tmp/graft_dedup_skew"
    val words = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = words.replace("word30", "changed")
    val lone = (1 to 60).map(i => s"zz$i").mkString(" ")
    val docs = ((0 until 180).map(i => (i.toLong * 3, words)) ++
      (0 until 120).map(i => (i.toLong * 3 + 1, nearDup)) ++
      Seq((2000L, lone)))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("skew-heavy corpus: cluster family agrees across forms and sizes the mega-cluster") {
    // a count window would sort all 300 members of the merged cluster
    // in one task; the aggregate+join path must produce the same rows
    val full = operators.Dedup.qDedupCluster(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rep = operators.Dedup.qDedupClusterRep(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == full.toSeq, "rep variant diverged from parent on skew corpus")
    // all 300 replicas merge into one cluster under the min id; the
    // unrelated doc never enters the pair graph
    assert(full.length == 300, s"expected 300 clustered docs, got ${full.length}")
    assert(full.forall { case (_, cid, n) => cid == 0L && n == 300L },
      full.take(5).toSeq.toString)
    assert(!full.exists(_._1 == 2000L))
  }

  test("rep variant matches the parent on the real sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val full = operators.Dedup.qDedupCluster(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rep = operators.Dedup.qDedupClusterRep(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.nonEmpty, "sf0.001 corpus yielded no dup clusters")
    assert(rep.toSeq == full.toSeq)
  }

  test("substring rep variant is byte-identical to the parent on replica-bearing corpora") {
    // repDir plants verbatim copies (within-group path), near-dup
    // copies sharing windows (cross-group path), and texts under the
    // 40-char window (must drop); sf0.001 covers organic sharing
    for (d <- Seq(repDir, "/root/testdata/sf0.001")) {
      val full = operators.Dedup.qDedupSubstring(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val rep = operators.Dedup.qDedupSubstringRep(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(full.nonEmpty, s"$d yielded no shared-window pairs")
      assert(rep.toSeq == full.toSeq, s"substring rep diverged from parent on $d")
    }
  }

  test("simhash rep variant is byte-identical to the parent on replica-bearing corpora") {
    for (d <- Seq(repDir, "/root/testdata/sf0.001")) {
      val full = operators.Dedup.qDedupSimhash(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val rep = operators.Dedup.qDedupSimhashRep(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(full.nonEmpty, s"$d yielded no simhash pairs")
      assert(rep.toSeq == full.toSeq, s"simhash rep diverged from parent on $d")
    }
  }

  test("substring cut-list: later occurrences of a shared span are cut as one merged run") {
    // doc 1 carries the original 60-char span (all keepers — no cuts);
    // doc 2 embeds one later copy; doc 3 embeds TWO copies (both cut).
    // Fillers use disjoint letter families with counters, so the only
    // duplicated 40-char windows are the 21 fully inside the span.
    val d = "/tmp/graft_dedup_cuts"
    val uniqueA = (0 until 25).map(i => f"A$i%03d").mkString // 100 chars
    val span = (0 until 15).map(i => f"S$i%03d").mkString    // 60 chars
    val uniqueB = (0 until 20).map(i => f"B$i%03d").mkString // 80 chars
    val tailB = (0 until 10).map(i => f"C$i%03d").mkString   // 40 chars
    // letters only: a digit-final filler would recreate doc 2's
    // "<digit><span prefix>" window and extend doc 3's island by one
    val xfill = (0 until 30).map(i => ('a' + (i % 26)).toChar).mkString // 30 chars
    val docs = Seq(
      (1L, uniqueA + span),
      (2L, uniqueB + span + tailB),
      (3L, span + xfill + span))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = operators.Dedup.qDedupCuts(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2: span sits at 81..140 → cut windows start at 81..101 →
    // one merged [81, 140] run; doc 3: spans at 1..60 and 91..150
    assert(rows.toSeq == Seq(
      (2L, 81L, 140L, 60L), (3L, 1L, 60L, 60L), (3L, 91L, 150L, 60L)),
      rows.toSeq.toString)
  }

  test("rep variants match parents on the skew corpus (300-replica group)") {
    // the regime the rep forms exist for: within-group pair counts and
    // cross-group expansion must both survive a mega md5 group
    val fullS = operators.Dedup.qDedupSubstring(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val repS = operators.Dedup.qDedupSubstringRep(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(repS.toSeq == fullS.toSeq, "substring rep diverged on skew corpus")
    // every replica pair shares windows (copies share everything, the
    // two texts share their unchanged runs) → the full C(300,2) output
    assert(fullS.length == 300 * 299 / 2,
      s"300 mutually-sharing replicas must emit all pairs, got ${fullS.length}")
    val fullH = operators.Dedup.qDedupSimhash(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val repH = operators.Dedup.qDedupSimhashRep(spark, skewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(repH.toSeq == fullH.toSeq, "simhash rep diverged on skew corpus")
  }

  test("single-task CC fast path is row-identical to the iterative loop (chain, clique, pair)") {
    // propagateMinLabels takes the one-task union-find below
    // LocalCcEdgeBound (r17: the loop's per-round overhead was 4.0 s
    // of q_dedup_cluster's 4.5 s warm cost on a 15k-pair graph) and
    // the join loop above it; both must compute the same closure.
    // The graph exercises the loop's convergence: a 40-node CHAIN
    // (diameter 39 — the min-fused init still needs many rounds), a
    // 10-node clique, an isolated pair, and high-id noise edges.
    val spark = SparkSpecBase.spark
    import spark.implicits._
    val pairs: Seq[(Long, Long)] =
      (0L until 39L).map(i => (i, i + 1)) ++ // chain 0..39
        (for (a <- 100L until 110L; b <- (a + 1) until 110L) yield (a, b)) ++
        Seq((500L, 501L)) ++
        Seq((600L, 700L), (700L, 800L), (800L, 900L))
    val edges = pairs.toDF("src", "dst")
      .union(pairs.map(_.swap).toDF("src", "dst")).cache()
    edges.count()
    val fast = operators.Dedup.propagateMinLabels(spark, edges)
      .as[(Long, Long)].collect().sorted
    val loop = operators.Dedup.propagateMinLabels(spark, edges, localBound = -1)
      .as[(Long, Long)].collect().sorted
    assert(fast.sameElements(loop),
      s"fast path diverged from the loop:\n${fast.take(10).toSeq} vs ${loop.take(10).toSeq}")
    // and the closure itself is right: chain collapses to label 0,
    // clique to 100, pair to 500, path-of-edges to 600
    val m = fast.toMap
    assert((0L to 39L).forall(m(_) == 0L))
    assert((100L until 110L).forall(m(_) == 100L))
    assert(m(501L) == 500L && m(500L) == 500L)
    assert(Seq(600L, 700L, 800L, 900L).forall(m(_) == 600L))
    edges.unpersist()
  }
}

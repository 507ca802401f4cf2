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

  test("skew-heavy corpus: cluster family agrees across forms and sizes the mega-cluster") {
    // one md5 group of 400 verbatim copies + 300 copies of its
    // near-dup — the replica regime the aggregate+join cluster-size
    // path exists for (a count window would sort all 700 members of
    // the merged cluster in one task); plus islands that must stay out
    val d = "/tmp/graft_dedup_skew"
    val words = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = words.replace("word30", "changed")
    val lone = (1 to 60).map(i => s"zz$i").mkString(" ")
    val docs = ((0 until 400).map(i => (i.toLong * 3, words)) ++
      (0 until 300).map(i => (i.toLong * 3 + 1, nearDup)) ++
      Seq((2000L, lone)))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val full = operators.Dedup.qDedupCluster(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rep = operators.Dedup.qDedupClusterRep(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == full.toSeq, "rep variant diverged from parent on skew corpus")
    // all 700 replicas merge into one cluster under the min id; the
    // unrelated doc never enters the pair graph
    assert(full.length == 700, s"expected 700 clustered docs, got ${full.length}")
    assert(full.forall { case (_, cid, n) => cid == 0L && n == 700L },
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
}
